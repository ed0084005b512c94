#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every harness
query on Spark AND its DuckDB oracle, compare row count + column names +
order-insensitive values. Usage:

    python tools/compare_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_rdb_bq_import_spark import harness
from dlp_rdb_bq_import_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    key = df.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = (av.isna() & bv.isna()) | (av == bv)
            if not ok.all():
                bad = (~ok).sum()
                diff = np.nanmax(np.abs(av - bv))
                problems.append(f"col {c}: {bad} float mismatches, max abs diff {diff:g}")
        else:
            avs, bvs = av.astype(str), bv.astype(str)
            ok = avs == bvs
            if not ok.all():
                i = int(np.argmax(~ok.values))
                problems.append(
                    f"col {c}: {int((~ok).sum())} mismatches, first at row {i}: "
                    f"spark={avs.iloc[i]!r} oracle={bvs.iloc[i]!r} (dtypes {av.dtype}/{bv.dtype})"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--out",
        default=None,
        help="write a per-query JSON summary (the committed full-gate "
        "artifact — VERDICT r8 item 7; the driver's own gate samples "
        "only the first 50 registry entries)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="compare_oracle")
    con = duck_con(args.sf)
    qs = harness.queries()
    oracles = harness.oracle_sql()
    names = args.names or list(qs)

    failures = 0
    records: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()  # isolate queries' cached intermediates
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            t_build = time.time() - t0
            spark_pdf = sdf.toPandas()
            t_exec = time.time() - t0 - t_build
            if os.environ.get("COMPARE_VERBOSE"):
                print(f"      {name}: build {t_build:.1f}s exec {t_exec:.1f}s")
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e).splitlines()[0][:300]}")
            failures += 1
            records[name] = {"status": "spark_error", "err": f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"}
            continue
        if name not in oracles:
            print(f"ok-   {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            records[name] = {"status": "rows_only", "spark_rows": len(spark_pdf)}
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e).splitlines()[0][:300]}")
            failures += 1
            records[name] = {"status": "oracle_error", "err": f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"}
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(spark_pdf)} vs {len(duck_pdf)} rows):")
            for p in problems:
                print(f"      {p}")
            records[name] = {
                "status": "mismatch",
                "spark_rows": len(spark_pdf),
                "oracle_rows": len(duck_pdf),
                "problems": problems[:5],
            }
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")
            records[name] = {
                "status": "hash_match",
                "spark_rows": len(spark_pdf),
                "oracle_rows": len(duck_pdf),
            }
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if args.out:
        import json

        summary = {
            "sf_dir": args.sf,
            "queries": len(names),
            "passed": len(names) - failures,
            "failed": failures,
            "hash_matched": sum(
                1 for r in records.values() if r["status"] == "hash_match"
            ),
            "rows_only": sum(
                1 for r in records.values() if r["status"] == "rows_only"
            ),
            "results": records,
        }
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
