#!/usr/bin/env python
"""VERDICT r11 task 8: quantify the _stage_edges win on the iterative
graph family at sf1 — staged (production code) vs unstaged (edges
re-derived and re-shuffled every round, the pre-r11 shape) in two
SEPARATE Spark sessions (subprocesses) so JVM state cannot bleed
between arms. Merges the comparison into SOAK_sf1.json as
``edge_staging_comparison`` so the claimed per-round shuffle saving is
a committed number, not a plan-reading.

Usage: python tools/edge_staging_compare.py [--sf .scratch/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

QUERIES = [
    "pagerank_supplier_part",
    "kcore_supplier",
    "communities_supplier",
    "host_hits_scores",
    "connected_components_star",
]

_ARM = r'''
import json, sys, time
sys.path.insert(0, %(repo)r)
mode, sf = sys.argv[1], sys.argv[2]
from dlp_rdb_bq_import_spark.operators import graph
if mode == "unstaged":
    # pre-r11 shape: no materialization, no pinned partitioning —
    # every iteration re-derives and re-shuffles the edge table
    graph._stage_edges = lambda e, key: e
from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark
spark = get_spark(app_name="edge_staging_" + mode)
spark.range(1000).count()
qs = harness.queries()
out = {}
for name in %(queries)r:
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        qs[name](spark, sf).count()
        runs.append(round(time.time() - t0, 2))
    out[name] = {"runs": runs, "min": min(runs)}
    print(json.dumps({"mode": mode, "query": name, **out[name]}), flush=True)
print("RESULT " + json.dumps(out))
'''


def run_arm(mode: str, sf: str) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _ARM % {"repo": repo, "queries": QUERIES}
    r = subprocess.run(
        [sys.executable, "-c", code, mode, sf],
        capture_output=True,
        text=True,
        timeout=3000,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(f"{mode} arm failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scratch/sf1")
    ap.add_argument("--soak", default="SOAK_sf1.json")
    args = ap.parse_args()
    staged = run_arm("staged", args.sf)
    unstaged = run_arm("unstaged", args.sf)
    comparison = {
        "method": "two fresh sessions (subprocess per arm), min-of-2 per "
        "query, cache cleared between runs; unstaged = _stage_edges "
        "pass-through (no materialization, no pinned partitioning — the "
        "pre-r11 shape)",
        "sf_dir": args.sf,
        "queries": {
            q: {
                "staged_sec": staged[q]["min"],
                "unstaged_sec": unstaged[q]["min"],
                "speedup": round(unstaged[q]["min"] / max(staged[q]["min"], 0.01), 2),
                "staged_runs": staged[q]["runs"],
                "unstaged_runs": unstaged[q]["runs"],
            }
            for q in QUERIES
        },
    }
    tot_s = sum(staged[q]["min"] for q in QUERIES)
    tot_u = sum(unstaged[q]["min"] for q in QUERIES)
    comparison["total_staged_sec"] = round(tot_s, 2)
    comparison["total_unstaged_sec"] = round(tot_u, 2)
    comparison["total_speedup"] = round(tot_u / max(tot_s, 0.01), 2)
    if os.path.exists(args.soak):
        with open(args.soak) as f:
            soak = json.load(f)
    else:
        soak = {}
    soak["edge_staging_comparison"] = comparison
    with open(args.soak, "w") as f:
        json.dump(soak, f, indent=1)
    print(json.dumps(comparison["queries"], indent=1))
    print(
        f"total: staged {tot_s:.1f}s vs unstaged {tot_u:.1f}s "
        f"({comparison['total_speedup']}x) -> merged into {args.soak}"
    )


if __name__ == "__main__":
    main()
