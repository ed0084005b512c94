#!/usr/bin/env python
"""Measure rows-through-window for the distinct-domain-window query
family across scale factors (VERDICT r12 task 3).

The SinglePartitionWindow allowances in tools/plan_lint.py claim their
window inputs are bounded INDEPENDENT of corpus size (raw-measure
quantized domains, calendar grains, fixed bins, dimension tables).
This probe checks the claim EMPIRICALLY, not by reading plans: it runs
each family query at several scale factors, then walks the FINAL
(post-AQE) physical plan and records, for every Window operator, the
``recordsRead`` metric of the Exchange feeding it — the actual row
count that serialized through the window, as counted by the shuffle
layer at runtime. Domains that saturate (cents-quantized prices,
day-grain durations) should show near-flat curves as the corpus grows
10×/100×; entity-grain domains (the class the lint now forbids) would
grow linearly — the shape that condemned zipf_slope (r11) and
gini_coefficient (r12), both since reranked onto the distributed
prefix-sum path (gini is probed here as the contrast case: its plan
should show NO single-partition window at any sf).

Usage: python tools/window_domain_probe.py \
          [--sfs /root/testdata/sf0.1,.scratch/sf1,.scratch/sf10] \
          [--out .scratch/window_domain_sf10_r13.json] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_rdb_bq_import_spark import harness  # noqa: E402
from dlp_rdb_bq_import_spark.session import get_spark  # noqa: E402

# Every query holding (or recently holding) a SinglePartitionWindow
# allowance, plus gini (reranked r13 — the negative control).
FAMILY = [
    "classifier_auc",
    "weighted_median_price",
    "ks_drift_test",
    "mann_whitney_priority",
    "spearman_price_quantity",
    "kruskal_wallis_priority_price",
    "cliffs_delta_returnflag",
    "kaplan_meier_retention",
    "logrank_churn_test",
    "cusum_shift_detection",
    "period_over_period",
    "cumulative_gains_deciles",
    "pareto_part_revenue",
    "rank_dense_rank",
    "gini_revenue_concentration",
]


# queries whose lint allowance carries the DIMENSION tag: their window
# input tracks a DIMENSION table, so it grows when the dimension does —
# a documented operating envelope, not a corpus-size-invariance claim
# (see .scratch/window_allowance_audit_r13.md). pareto_part_revenue
# left this set in r14: its global mode now routes through
# layout.prefix_sums and must probe 0 like gini.
DIMENSION_TAGGED = {"rank_dense_rank"}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _unwrap(node):
    """Descend through AQE wrappers to concrete operators."""
    nm = node.nodeName()
    if nm.startswith("AdaptiveSparkPlan"):
        return _unwrap(node.executedPlan())
    if nm.endswith("QueryStage"):
        return _unwrap(node.plan())
    return node


def _metric(node, key):
    m = node.metrics()
    opt = m.get(key)
    return int(opt.get().value()) if opt.isDefined() else None


def _first_exchange_stats(node):
    """(numPartitions, recordsRead) of the first Exchange below node."""
    stack = [_unwrap(c) for c in _children(node)]
    while stack:
        n = stack.pop(0)
        if n.nodeName().startswith("Exchange") or "ShuffleExchange" in n.nodeName():
            return _metric(n, "numPartitions"), _metric(n, "recordsRead")
        if "Window" in n.nodeName():
            continue  # a nested window owns its own exchange
        stack.extend(_unwrap(c) for c in _children(n))
    return None, None


def probe_windows(qe) -> list[dict]:
    """All Window operators in the final plan with their feed stats."""
    out = []
    stack = [_unwrap(qe.executedPlan())]
    while stack:
        n = stack.pop(0)
        nm = n.nodeName()
        if nm.startswith("Window"):
            parts, rows = _first_exchange_stats(n)
            out.append(
                {
                    "node": nm,
                    "feed_partitions": parts,
                    "rows_through_window": rows,
                    "single_partition": parts == 1,
                }
            )
        stack.extend(_unwrap(c) for c in _children(n))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sfs",
        default="/root/testdata/sf0.1,.scratch/sf1,.scratch/sf10",
    )
    ap.add_argument("--out", default=".scratch/window_domain_sf10_r13.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="window_domain_probe")
    qs = harness.queries()
    names = args.names or FAMILY
    report: dict = {"method": (
        "per query x sf: run to completion, then read the recordsRead "
        "metric of the Exchange feeding each Window in the final "
        "post-AQE physical plan (runtime shuffle-layer counts, not "
        "plan text); corpus_rows = input table row counts for context"
    ), "sfs": {}}
    for sf in args.sfs.split(","):
        sf = sf.strip()
        if not os.path.isdir(sf):
            print(f"SKIP sf dir {sf}: missing")
            continue
        import pyarrow.parquet as pq

        corpus = {}
        for t in ("customer", "orders", "lineitem", "events"):
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                corpus[t] = pq.ParquetFile(p).metadata.num_rows
        entry: dict = {"corpus_rows": corpus, "queries": {}}
        for name in names:
            if name not in qs:
                print(f"SKIP {name}: not registered")
                continue
            t0 = time.time()
            try:
                df = qs[name](spark, sf)
                qe = df._jdf.queryExecution()
                # execute THIS plan tree (df.count() would build a new
                # one whose metrics we can't reach): SparkPlan.execute()
                # returns the InternalRow RDD; count() drives it
                n_out = int(qe.executedPlan().execute().count())
                windows = probe_windows(qe)
            except Exception as e:
                entry["queries"][name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"ERR   {name} @ {sf}: {e}")
                continue
            sec = round(time.time() - t0, 2)
            spw = [w for w in windows if w["single_partition"]]
            entry["queries"][name] = {
                "sec": sec,
                "out_rows": n_out,
                "windows": windows,
                "max_rows_through_single_partition_window": max(
                    (w["rows_through_window"] or 0 for w in spw), default=0
                ),
            }
            print(
                f"ok    {name} @ {sf}: {sec}s, "
                f"{len(windows)} window(s), spw max rows="
                f"{entry['queries'][name]['max_rows_through_single_partition_window']}"
            )
        report["sfs"][sf] = entry

    # growth verdicts: compare the largest vs smallest sf per query
    sf_keys = [k for k in report["sfs"]]
    if len(sf_keys) >= 2:
        lo, hi = sf_keys[0], sf_keys[-1]
        lo_rows = sum(report["sfs"][lo]["corpus_rows"].values()) or 1
        hi_rows = sum(report["sfs"][hi]["corpus_rows"].values()) or 1
        corpus_growth = hi_rows / lo_rows
        verdicts = {}
        for name in names:
            a = report["sfs"][lo]["queries"].get(name, {})
            b = report["sfs"][hi]["queries"].get(name, {})
            ra = a.get("max_rows_through_single_partition_window")
            rb = b.get("max_rows_through_single_partition_window")
            if ra is None or rb is None:
                continue
            growth = (rb / ra) if ra else (0.0 if not rb else float("inf"))
            verdicts[name] = {
                "spw_rows_low_sf": ra,
                "spw_rows_high_sf": rb,
                "window_growth": round(growth, 2) if growth != float("inf") else "inf",
                "corpus_growth": round(corpus_growth, 2),
                "classification": (
                    "no-single-partition-window"
                    if ra == 0 and rb == 0
                    else "saturates (bounded domain)"
                    if growth <= max(2.0, corpus_growth * 0.1)
                    else "grows with its DIMENSION (tagged documented "
                    "envelope: grouped/partitioned mode offered)"
                    if name in DIMENSION_TAGGED
                    else "GROWS WITH CORPUS (entity-grain — forbidden)"
                ),
            }
        report["verdicts"] = verdicts
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
