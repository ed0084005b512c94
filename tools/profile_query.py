#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named query: time the DataFrame BUILD (python-side plan
construction), ANALYSIS/OPTIMIZATION (explain), and EXECUTION via the
noop sink (guide §1.4 — computes every column, no driver transfer),
min-of-N. Also counts Spark jobs launched during one execution and
dumps `.explain("formatted")` to plans/r14/<name>_<tag>.txt.

Usage:
    python tools/profile_query.py [--sf DIR] [--tag before] [--runs 3] name...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default=None, help="dump plan to plans/<round>/<name>_<tag>.txt")
    ap.add_argument("--round", default="r15", help="plans/ subdirectory for --tag dumps")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--count", action="store_true",
                    help="materialize with .count() (bench methodology) instead of noop")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="profile_query")
    sc = spark.sparkContext
    qs = harness.queries()
    spark.range(1000).count()  # warm codegen path
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        sc.setJobDescription(f"profile:{name}")
        builds, plans, execs = [], [], []
        jobs0 = jobs1 = 0
        for r in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, args.sf)
            t1 = time.time()
            plan_txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            t2 = time.time()
            jobs0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            tracker_ids = set(sc.statusTracker().getJobIdsForGroup(None) or [])
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            jobs1 = len(set(sc.statusTracker().getJobIdsForGroup(None) or []) - tracker_ids)
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
            if args.tag and r == 0:
                with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan_txt)
        print(
            f"{name}: build={min(builds):.3f}s plan={min(plans):.3f}s "
            f"exec={min(execs):.3f}s (min of {args.runs}; exec runs: "
            f"{', '.join(f'{e:.2f}' for e in execs)}) jobs~{jobs1}",
            flush=True,
        )
        sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
