#!/usr/bin/env python
"""Dump per-stage task-metric summaries (launch spread, deser, run,
GC, result ser, getting-result) from a query's event log."""
import json, os, subprocess, sys, tempfile, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = sys.argv[1]
    evdir = tempfile.mkdtemp(prefix="evlog_")
    spark = get_spark(app_name=f"st_{name}", extra_conf={
        "spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir})
    qs = harness.queries()
    spark.range(1000).count()
    spark.catalog.clearCache()
    qs[name](spark, sf_dir).count()   # warm
    spark.catalog.clearCache()
    marker = time.time() * 1000
    t0 = time.time(); qs[name](spark, sf_dir).count(); t1 = time.time()
    print(f"total={t1-t0:.3f}s")
    spark.stop()
    paths = sorted(glob.glob(os.path.join(evdir, "**", "events*"), recursive=True))
    tasks = {}
    stages = {}
    for p in paths:
        out = subprocess.run(["zstd","-dc",p], capture_output=True).stdout.decode()
        for line in out.splitlines():
            try: e = json.loads(line)
            except Exception: continue
            if e.get("Event") == "SparkListenerTaskEnd":
                si = e["Stage ID"]; ti = e["Task Info"]; tm = e.get("Task Metrics") or {}
                if ti["Launch Time"] < marker: continue
                tasks.setdefault(si, []).append({
                    "launch": ti["Launch Time"], "finish": ti["Finish Time"],
                    "deser": tm.get("Executor Deserialize Time",0),
                    "run": tm.get("Executor Run Time",0),
                    "gc": tm.get("JVM GC Time",0),
                    "rser": tm.get("Result Serialization Time",0),
                    "fetch": (tm.get("Shuffle Read Metrics") or {}).get("Fetch Wait Time",0),
                    "wtime": (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Write Time",0)//1000000,
                    "wbytes": (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written",0),
                    "wrec": (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Records Written",0),
                    "rrec": (tm.get("Shuffle Read Metrics") or {}).get("Total Records Read",0),
                    "cpu": tm.get("Executor CPU Time",0)//1000000,
                })
            elif e.get("Event") == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                if si.get("Submission Time",0) and si["Submission Time"] >= marker:
                    stages[si["Stage ID"]] = si
    for sid in sorted(tasks):
        ts = tasks[sid]; n = len(ts)
        wall = (max(t["finish"] for t in ts) - min(t["launch"] for t in ts))
        spread = (max(t["launch"] for t in ts) - min(t["launch"] for t in ts))
        tot = lambda k: sum(t[k] for t in ts)
        dur = sum(t["finish"]-t["launch"] for t in ts)
        nm = stages.get(sid,{}).get("Stage Name","?").split(" at ")[0]
        print(f"stage {sid} [{nm}] n={n} wall={wall}ms launch_spread={spread}ms "
              f"sum(task)={dur}ms deser={tot('deser')} run={tot('run')} cpu={tot('cpu')} gc={tot('gc')} "
              f"rser={tot('rser')} fetch={tot('fetch')} wtime={tot('wtime')} "
              f"wMB={tot('wbytes')/1e6:.2f} wrec={tot('wrec')} rrec={tot('rrec')}")

if __name__ == "__main__":
    main()
