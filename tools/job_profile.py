#!/usr/bin/env python
"""Event-log job/stage profile for one query: runs the query twice
(warm, then measured), parses the Spark event log, and prints per-job
wall clock, stage task counts, and inter-job driver gaps — the
where-does-the-fixed-overhead-go instrument (guide §1/§7)."""
import json, os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = sys.argv[1]
    evdir = tempfile.mkdtemp(prefix="evlog_")
    spark = get_spark(app_name=f"jobprof_{name}", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
    })
    qs = harness.queries()
    spark.range(1000).count()
    # warm run
    spark.catalog.clearCache()
    qs[name](spark, sf_dir).count()
    spark.catalog.clearCache()
    marker = time.time() * 1000
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    t_build = time.time()
    df.count()
    t1 = time.time()
    print(f"total={t1-t0:.3f}s build={t_build-t0:.3f}s exec={t1-t_build:.3f}s")
    spark.stop()
    # parse event log
    import glob, io
    try:
        import zstandard
        _zst = True
    except Exception:
        _zst = False
    paths = sorted(glob.glob(os.path.join(evdir, "**", "events*"), recursive=True)) or             sorted(p for p in glob.glob(os.path.join(evdir, "*")) if os.path.isfile(p))
    def lines():
        for p in paths:
            if p.endswith(".zstd"):
                import subprocess
                out = subprocess.run(["zstd", "-dc", p], capture_output=True)
                for ln in out.stdout.decode().splitlines(): yield ln
            else:
                for ln in open(p): yield ln
    jobs = {}; stages = {}
    for line in lines():
        try: e = json.loads(line)
        except Exception: continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            if e["Submission Time"] < marker: continue
            jobs[jid] = {"t0": e["Submission Time"], "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                         "ntasks": sum(s["Number of Tasks"] for s in e["Stage Infos"]),
                         "desc": (e.get("Properties") or {}).get("spark.job.description","")[:60]}
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs: jobs[jid]["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {"name": si["Stage Name"].split(" at ")[0],
                                      "ntasks": si["Number of Tasks"],
                                      "ms": si.get("Completion Time",0)-si.get("Submission Time",0)}
    prev_end = marker
    tot_gap = 0; tot_job = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j: continue
        gap = j["t0"] - prev_end
        tot_gap += max(gap, 0); tot_job += j["t1"] - j["t0"]
        st = ", ".join(f'{stages.get(s,{}).get("name","?")}:{stages.get(s,{}).get("ntasks","?")}t/{stages.get(s,{}).get("ms","?")}ms'
                       for s in j["stages"] if s in stages)
        print(f"job {jid}: {(j['t1']-j['t0'])/1000:.3f}s gap_before={gap/1000:.3f}s ntasks={j['ntasks']} [{st}] {j['desc']}")
        prev_end = j["t1"]
    print(f"sum(job wall)={tot_job/1000:.3f}s sum(gaps)={tot_gap/1000:.3f}s njobs={len(jobs)}")

if __name__ == "__main__":
    main()
