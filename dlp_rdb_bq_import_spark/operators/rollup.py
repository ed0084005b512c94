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


def approx_distinct_rollup(
    df: DataFrame,
    ts_col: str,
    item_col: str,
    levels: list[str],
    lg_k: int = 12,
) -> dict[str, DataFrame]:
    """COUNT(DISTINCT) across a time hierarchy from ONE raw scan — the
    sketch analogue of :func:`cascading_rollup` for the one aggregate
    its mergeable partials cannot carry (distinct counts are not
    summable: the same user active on Monday and Tuesday is one weekly
    user, not two).

    The finest level builds an HLL sketch per bucket
    (``hll_sketch_agg``); every coarser level merges the finer level's
    BINARY sketch column with ``hll_union_agg`` — never touching raw
    rows again. HLL registers are per-slot maxima, so merging finer
    sketches yields byte-identical registers to sketching the coarse
    bucket directly (max over a union is the max of maxes) — the
    estimate cascade is exactly as accurate as a direct rollup, which
    the tests pin as strict equality, and relative error vs exact
    distinct counts is the usual ~1.04/sqrt(2^lg_k).

    Returns {level: DataFrame(bucket_start, sketch (binary),
    approx_distinct (long))}; ``levels`` nest finest-first like
    cascading_rollup.
    """
    if not levels:
        raise ValueError("levels must be non-empty, finest first")
    ts = F.col(ts_col).cast("timestamp")
    out: dict[str, DataFrame] = {}
    cur = (
        df.groupBy(F.window(ts, levels[0]).alias("w"))
        .agg(F.hll_sketch_agg(F.col(item_col), F.lit(lg_k)).alias("sketch"))
        .select(F.col("w.start").alias("bucket_start"), "sketch")
    )
    out[levels[0]] = cur.select(
        "bucket_start",
        "sketch",
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )
    for lvl in levels[1:]:
        cur = (
            cur.groupBy(F.window(F.col("bucket_start"), lvl).alias("w"))
            .agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))
            .select(F.col("w.start").alias("bucket_start"), "sketch")
        )
        out[lvl] = cur.select(
            "bucket_start",
            "sketch",
            F.hll_sketch_estimate("sketch").alias("approx_distinct"),
        )
    return out
