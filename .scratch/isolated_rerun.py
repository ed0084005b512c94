"""VERDICT r11 task 3: isolated single-query reruns of the drifted
bench queries at sf0.1 — one FRESH Spark session per query (subprocess)
so sweep contention from the 326-query tree cannot inflate timings."""
import json
import subprocess
import sys

QUERIES = ["dedup_simhash", "semantic_dedup", "robots_screen", "bpe_encode"]
R10 = {"dedup_simhash": 2.433, "semantic_dedup": 2.31, "robots_screen": 2.381, "bpe_encode": 5.011}

ONE = r'''
import json, sys, time
sys.path.insert(0, "/root/repo")
from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark
spark = get_spark(app_name="isolated_rerun")
spark.range(1000).count()  # JVM warmup
fn = harness.queries()[sys.argv[1]]
runs = []
for _ in range(3):
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, "/root/testdata/sf0.1").count()
    runs.append(round(time.time() - t0, 3))
print(json.dumps({"query": sys.argv[1], "runs": runs, "min": min(runs)}))
'''

out = {}
for q in QUERIES:
    r = subprocess.run(
        [sys.executable, "-c", ONE, q], capture_output=True, text=True, timeout=600
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    d["r10_sweep"] = R10[q]
    d["ratio_vs_r10"] = round(d["min"] / R10[q], 2)
    out[q] = d
    print(json.dumps(d), flush=True)
json.dump(out, open("/root/repo/.scratch/isolated_rerun_r12.json", "w"), indent=1)
