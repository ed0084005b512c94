#!/usr/bin/env python
"""Scale the sf0.1 fixtures 10× into an sf1 directory for the scale
soak (VERDICT r2 item 4) — DuckDB-side so it never contends with a
running Spark session.

Replication shifts every PRIMARY/FOREIGN key family by a
replica-specific offset so cardinality and join selectivity scale like
real data (10 verbatim copies would fan joins out 100× and collapse
every distinct-count). Key families shifted consistently across
tables: custkey, orderkey, partkey, suppkey, event_id, user_id,
doc_id, vec_id. nation/region are fixed dimensions (25/5 rows at every
TPC-H scale) and keep their key space, so shifted fact rows still hit
real dimension keys. Document TEXT is left verbatim per replica —
cross-replica near-duplicates are exactly what the dedup soak wants to
chew on. Timestamps in `events` are left verbatim too (10× events in
the same window = 10× arrival rate, the harder sessionize case).

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1]
                                [--dst .scratch/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# key column → offset family; every column in a family shifts by the
# same replica offset (a generous constant > any sf0.1 key).
FAMILIES = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}
OFFSET = 10_000_000  # > max key at sf0.1 for every family

FIXED_TABLES = {"region", "nation"}  # constant-size dimensions
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def scaled_select(con: duckdb.DuckDBPyConnection, path: str, replica: int) -> str:
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')"
        ).fetchall()
    ]
    exprs = []
    for c in cols:
        if c in FAMILIES and replica > 0:
            exprs.append(f"{c} + {replica * OFFSET} AS {c}")
        else:
            exprs.append(c)
    return f"SELECT {', '.join(exprs)} FROM read_parquet('{path}')"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in ALL_TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(args.dst, f"{t}.parquet")
        if t in FIXED_TABLES:
            union = scaled_select(con, src, 0)
        else:
            union = " UNION ALL ".join(
                scaled_select(con, src, r) for r in range(args.factor)
            )
        # multiple row groups so Spark scans parallelize (the sf0.1
        # fixtures are single-row-group; at sf1 that would serialize
        # every scan into one task)
        con.execute(
            f"COPY ({union}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
