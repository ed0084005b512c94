#!/usr/bin/env python
"""Bench-methodology timing for a named subset of queries (min-of-2,
min-of-3 when sub-second, clearCache between runs, .count() action) —
for core-count scaling A/Bs without a full sweep."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="bench_subset")
    qs = harness.queries()
    spark.range(1000).count()
    timings = {}
    for name in names:
        best, run = None, 0
        while run < 2 or (run < 3 and best < 1.0):
            run += 1
            spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()
            el = round(time.time() - t0, 3)
            best = el if best is None else min(best, el)
        timings[name] = best
        print(f"# {name}: {best}s", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "queries": timings}))
    spark.stop()

if __name__ == "__main__":
    main()
