#!/usr/bin/env python
"""Rows-through-EXCHANGE growth probe across scale factors (VERDICT
r13 task 4) — the window-domain instrument generalized to the shuffle
layer.

The window probe killed the entity-grain-window class by measuring
rows through each Window's feeding Exchange at sf0.1/1/10. The same
readout over EVERY Exchange in the ~30 most expensive queries catches
the next class before a 100× scale-up does: a join whose candidate
stream grows quadratically, a skew-collapsed exchange, an
accidentally-global repartition. For each query × sf this records the
max recordsRead over all Exchanges in the final post-AQE plan (runtime
shuffle-layer counts, not plan text), then classifies growth against
corpus growth:

- ``bounded``      — shuffle volume saturates (≤ 10% of corpus growth
                     or ≤ 2×): sketch folds, quantized domains, scalar
                     attaches.
- ``linear``       — tracks the corpus within [0.1×, 1.5×] of its
                     growth: one shuffle pass per row, the expected
                     shape for corpus-grain group-bys/joins. Fine at
                     100 TB — shuffles scale with executors.
- ``SUPER-LINEAR`` — exceeds 1.5× corpus growth: a pairwise blow-up or
                     replication factor that compounds with scale.
                     Build error; triage required.

Usage: python tools/exchange_probe.py \
          [--sfs /root/testdata/sf0.1,.scratch/sf1,.scratch/sf10] \
          [--top 30] [--out .scratch/exchange_probe_r14.json] [names...]

With no explicit names, the set is the --top most expensive benched
queries by the last committed driver bench artifact (BENCH_r13.json).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_rdb_bq_import_spark import harness  # noqa: E402
from dlp_rdb_bq_import_spark.session import get_spark  # noqa: E402
from tools.window_domain_probe import _children, _metric, _unwrap  # noqa: E402


def probe_exchanges(qe) -> list[dict]:
    """Every Exchange in the final post-AQE plan with its runtime
    stats: recordsRead (rows actually pulled through the shuffle),
    numPartitions, and the operator right above it for attribution."""
    out = []
    stack = [(None, _unwrap(qe.executedPlan()))]
    while stack:
        parent, n = stack.pop(0)
        nm = n.nodeName()
        if "Exchange" in nm:
            out.append(
                {
                    "node": nm,
                    "above": parent,
                    "partitions": _metric(n, "numPartitions"),
                    "records_read": _metric(n, "recordsRead"),
                }
            )
        stack.extend((nm, _unwrap(c)) for c in _children(n))
    return out


def _top_queries(top_n: int) -> list[str]:
    """The most expensive benched queries per the last committed
    driver bench artifact."""
    arts = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_r*.json",
    )))
    if not arts:
        raise SystemExit("no BENCH_r*.json artifact found")
    with open(arts[-1]) as f:
        art = json.load(f)
        # the driver's artifact wraps the bench JSON line under
        # "parsed"; a raw bench.py line has "queries" at top level
        timings = art.get("queries") or art.get("parsed", {}).get("queries", {})
    reg = harness.queries()
    ranked = sorted(
        (q for q in timings if q in reg), key=timings.get, reverse=True
    )
    return ranked[:top_n]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sfs", default="/root/testdata/sf0.1,.scratch/sf1,.scratch/sf10"
    )
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=".scratch/exchange_probe_r14.json")
    ap.add_argument(
        "--merge",
        action="store_true",
        help="fold results into an existing --out file (staged sf runs)",
    )
    ap.add_argument(
        "--verdicts-only",
        action="store_true",
        help="recompute the growth verdicts over an existing --out "
        "artifact without probing anything (no Spark session)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.verdicts_only:
        with open(args.out) as f:
            report = json.load(f)
        _compute_verdicts(report)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"-> {args.out} (verdicts recomputed)")
        return 0

    spark = get_spark(app_name="exchange_probe")
    qs = harness.queries()
    names = args.names or _top_queries(args.top)
    report: dict = {
        "method": (
            "per query x sf: run the plan to completion, then read the "
            "recordsRead metric of EVERY Exchange in the final post-AQE "
            "physical plan; max_rows_through_exchange is the widest "
            "shuffle the query performs; growth verdicts compare that "
            "width's growth to corpus growth between the smallest and "
            "largest sf"
        ),
        "queries_probed": names,
        "sfs": {},
    }
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        report["sfs"].update(prior.get("sfs", {}))
        report["queries_probed"] = sorted(
            set(prior.get("queries_probed", [])) | set(names)
        )
    for sf in args.sfs.split(","):
        sf = sf.strip()
        if not os.path.isdir(sf):
            print(f"SKIP sf dir {sf}: missing")
            continue
        import pyarrow.parquet as pq

        corpus = {}
        for t in ("customer", "orders", "lineitem", "events", "documents"):
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                corpus[t] = pq.ParquetFile(p).metadata.num_rows
        # under --merge, extend a prior entry for this sf instead of
        # replacing it (staged re-runs of a crashed pass)
        entry: dict = report["sfs"].get(sf) or {
            "corpus_rows": corpus,
            "queries": {},
        }
        entry["corpus_rows"] = corpus
        for name in names:
            if name not in qs:
                print(f"SKIP {name}: not registered")
                continue
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                df = qs[name](spark, sf)
                qe = df._jdf.queryExecution()
                n_out = int(qe.executedPlan().execute().count())
                exchanges = probe_exchanges(qe)
            except Exception as e:
                entry["queries"][name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"ERR   {name} @ {sf}: {e}")
                continue
            sec = round(time.time() - t0, 2)
            mx = max((e["records_read"] or 0 for e in exchanges), default=0)
            entry["queries"][name] = {
                "sec": sec,
                "out_rows": n_out,
                "n_exchanges": len(exchanges),
                "max_rows_through_exchange": mx,
                "exchanges": exchanges,
            }
            print(
                f"ok    {name} @ {sf}: {sec}s, {len(exchanges)} "
                f"exchange(s), max rows={mx}"
            )
            # incremental dump: an interrupted run keeps everything
            # probed so far (sf10 passes are long)
            report["sfs"][sf] = entry
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)
        report["sfs"][sf] = entry

    _compute_verdicts(report)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}")
    spark.stop()
    return 0


def _compute_verdicts(report: dict) -> None:
    # order sfs by corpus size so lo/hi are meaningful regardless of
    # the --sfs order staged --merge runs arrived in
    sf_keys = sorted(
        report["sfs"], key=lambda s: sum(report["sfs"][s]["corpus_rows"].values())
    )
    if len(sf_keys) >= 2:
        verdicts = {}
        for name in report["queries_probed"]:
            # per-query widest sf pair with a CLEAN probe (a query that
            # errored at sf10, or was excluded there with a printed
            # reason, still gets a verdict from the sfs it did run at —
            # the verdict records which pair it used)
            avail = [
                s
                for s in sf_keys
                if "max_rows_through_exchange"
                in report["sfs"][s]["queries"].get(name, {})
            ]
            if len(avail) < 2:
                continue
            lo, hi = avail[0], avail[-1]
            lo_rows = sum(report["sfs"][lo]["corpus_rows"].values()) or 1
            hi_rows = sum(report["sfs"][hi]["corpus_rows"].values()) or 1
            corpus_growth = hi_rows / lo_rows
            ra = report["sfs"][lo]["queries"][name]["max_rows_through_exchange"]
            rb = report["sfs"][hi]["queries"][name]["max_rows_through_exchange"]
            growth = (rb / ra) if ra else (0.0 if not rb else float("inf"))
            if ra == 0 and rb == 0:
                cls = (
                    "no-exchange (readback plan: the iterative/micro-batch "
                    "jobs run during construction; not instrumentable at "
                    "the exchange layer)"
                )
            elif growth <= max(2.0, corpus_growth * 0.1):
                cls = "bounded"
            elif growth <= corpus_growth * 1.5:
                cls = "linear-in-corpus"
            else:
                cls = "SUPER-LINEAR (triage required)"
            verdicts[name] = {
                "sf_pair": [lo, hi],
                "exchange_rows_low_sf": ra,
                "exchange_rows_high_sf": rb,
                "exchange_growth": (
                    round(growth, 2) if growth != float("inf") else "inf"
                ),
                "corpus_growth": round(corpus_growth, 2),
                "classification": cls,
            }
        report["verdicts"] = verdicts
        bad = [n for n, v in verdicts.items() if "SUPER" in v["classification"]]
        if bad:
            print(f"SUPER-LINEAR exchanges found: {bad}")


if __name__ == "__main__":
    raise SystemExit(main())
