"""Cascading multi-resolution time rollup (the "hypertable rollup" /
continuous-aggregate pattern; semantics re-derived from public
TimescaleDB/Druid docs, no reference counterpart — the reference has no
time-series surface at all).

The 100 TB point: a day-level aggregate must NOT re-scan raw events.
Each coarser level re-aggregates the next finer level's *mergeable
partials* — count, decimal sum, min, max — so the raw table is read
exactly once, and every subsequent level processes rows proportional to
the number of finer buckets (orders of magnitude smaller). Averages and
rates are derived at presentation time from (sum, count); they are NOT
mergeable and are never stored as partials.

Sums are carried as DECIMAL(30,6), not DOUBLE: float addition is not
associative, so a double partial re-aggregated in a different order
drifts — decimal keeps every level bit-identical to a direct
aggregation of the raw data (asserted in tests and by the DuckDB
oracle on the registered query).

Levels must nest evenly (e.g. 1 minute → 1 hour → 1 day): Spark's
``window()`` buckets align to the epoch, so any level whose duration
divides the next level's duration nests exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIALS = ("n", "sum_v", "min_v", "max_v")


def _finish(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.select(
        F.col("w.start").alias("bucket_start"), *keys, *_PARTIALS
    )


def cascading_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    levels: list[str],
) -> dict[str, DataFrame]:
    """Build the rollup cascade; returns {level: DataFrame} where each
    DataFrame has columns (bucket_start, *keys, n, sum_v, min_v, max_v)
    and each level after the first is computed FROM the previous level's
    partials. ``levels`` are Spark window durations, finest first
    ("1 minute", "1 hour", "1 day"); each must evenly divide the next.
    """
    if not levels:
        raise ValueError("levels must be non-empty, finest first")
    ts = F.col(ts_col).cast("timestamp")
    out: dict[str, DataFrame] = {}
    cur = _finish(
        df.groupBy(F.window(ts, levels[0]).alias("w"), *keys).agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(30,6)")).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        ),
        keys,
    )
    out[levels[0]] = cur
    for lvl in levels[1:]:
        cur = _finish(
            cur.groupBy(F.window("bucket_start", lvl).alias("w"), *keys).agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            ),
            keys,
        )
        out[lvl] = cur
    return out


def present(df: DataFrame, keys: list[str]) -> DataFrame:
    """Presentation form of one rollup level: stringified bucket,
    double-cast sum, derived mean — the non-mergeable finishing step."""
    return df.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_v").alias("min_v"),
        F.col("max_v").alias("max_v"),
        # double/double division, not decimal/long: decimal-division
        # scale rules are engine-specific, IEEE double division is not
        (F.col("sum_v").cast("double") / F.col("n").cast("double")).alias("mean_v"),
    )
