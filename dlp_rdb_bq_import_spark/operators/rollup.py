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

from . import local_rows_df

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


# ---------------------------------------------------------------------------
# mergeable quantile digest (equi-depth summary)
# ---------------------------------------------------------------------------


def quantile_digest(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable quantile summary: k+1 exact percentile points at ranks
    0, 1/k, …, 1 plus the population count — the equi-depth-histogram
    summary (the classic distributed-quantile technique behind
    Greenwald-Khanna/KLL-style sketches, public; this is the
    deterministic grid form). Any rank query interpolates between
    points with rank error ≤ 1/(2k); two digests MERGE without
    touching raw data (:func:`digest_merge` — average the piecewise-
    linear CDFs weighted by count), which is what lets a 100 TB
    warehouse keep one tiny persisted digest per partition/day and
    answer cross-slice quantiles by folding digests, the same
    persistence discipline as the HLL/CMS/KMV/Bloom sketches above.

    Output: ``group_cols…, rank_frac (double), value (double), n
    (long)`` — k+1 rows per group, NULL values excluded. Build cost is
    ONE array-percentile aggregate (single sort buffer per group);
    exact percentile ≡ DuckDB quantile_cont, so the BUILD is
    hash-matched; merge/query accuracy is pytest-bounded."""
    if k < 2:
        raise ValueError(f"quantile_digest: k must be >= 2, got {k}")
    keys = group_cols or []
    reserved = {"rank_frac", "value", "n", "_qs"}
    clash = reserved & set(keys)
    if clash:
        raise ValueError(f"group columns collide with reserved names: {sorted(clash)}")
    fracs = [i / k for i in range(k + 1)]
    x = F.col(value_col).cast("double")
    agg = (
        df.where(x.isNotNull())
        .groupBy(*keys)
        .agg(
            F.percentile(x, F.array(*[F.lit(q) for q in fracs])).alias("_qs"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(q) for q in fracs]).alias("rank_frac"),
        F.col("_qs").alias("value"),
    )
    return agg.select(
        *keys, F.explode(pairs).alias("_p"), "n"
    ).select(
        *keys,
        F.col("_p.rank_frac").alias("rank_frac"),
        F.col("_p.value").alias("value"),
        "n",
    )


def digest_query(
    digest: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Rank queries against a digest: linear interpolation between the
    stored (rank_frac, value) points — rank error ≤ 1/(2k) by the
    equi-depth guarantee. Output: ``group_cols…, q (double), value
    (double)``. Pure DataFrame algebra: each requested q joins its
    bracketing points via two keyed aggregations (no pandas, no
    collect), so querying a million per-partition digests stays
    distributed."""
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"digest_query: quantile {q} outside [0, 1]")
    keys = group_cols or []
    qdf = local_rows_df(
        digest.sparkSession, [(float(q),) for q in quantiles], "q double"
    )
    j = digest.crossJoin(F.broadcast(qdf))
    lo = (
        j.where(F.col("rank_frac") <= F.col("q"))
        .groupBy(*keys, "q")
        .agg(F.max_by(F.struct("rank_frac", "value"), F.col("rank_frac")).alias("_lo"))
    )
    hi = (
        j.where(F.col("rank_frac") >= F.col("q"))
        .groupBy(*keys, "q")
        .agg(F.min_by(F.struct("rank_frac", "value"), F.col("rank_frac")).alias("_hi"))
    )
    both = lo.join(hi, [*keys, "q"])
    r0, v0 = F.col("_lo.rank_frac"), F.col("_lo.value")
    r1, v1 = F.col("_hi.rank_frac"), F.col("_hi.value")
    interp = F.when(r1 == r0, v0).otherwise(
        v0 + (F.col("q") - r0) / (r1 - r0) * (v1 - v0)
    )
    return both.select(*keys, "q", interp.alias("value"))


def digest_merge(
    d1: DataFrame,
    d2: DataFrame,
    group_cols: list[str] | None = None,
    k: int | None = None,
) -> DataFrame:
    """Merge two digests into one WITHOUT raw data: the merged CDF is
    the count-weighted average of the two piecewise-linear CDFs,
    re-sampled at the output grid ranks (equi-depth histogram merge —
    exactly how distributed quantile summaries fold across partitions/
    days). Output schema matches :func:`quantile_digest`; ``k``
    defaults to the finer input grid. Rank error grows by at most the
    inputs' bounds plus 1/(2k) for the re-sampling (pytest-pinned).

    Shape: digests are (k+1)-row summaries, so the merge is an
    applyInPandas over grouped tiny tables — model-sized work per
    group regardless of the corpora the digests summarize."""
    import pandas as pd

    keys = group_cols or []
    u = d1.select(*keys, "rank_frac", "value", "n").withColumn(
        "_src", F.lit(1)
    ).unionByName(
        d2.select(*keys, "rank_frac", "value", "n").withColumn("_src", F.lit(2))
    )
    out_schema = ", ".join(
        [*(f"`{c}` {dict(u.dtypes)[c]}" for c in keys),
         "rank_frac double", "value double", "n long"]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        parts = []
        for _, sub in pdf.groupby("_src"):
            sub = sub.sort_values("rank_frac")
            parts.append(
                (sub["value"].to_numpy(), sub["rank_frac"].to_numpy(), int(sub["n"].iloc[0]))
            )
        if len(parts) == 1:  # group present on one side only
            (vs, rs, n) = parts[0]
            out_k = k if k is not None else len(rs) - 1
            grid = np.array([i / out_k for i in range(out_k + 1)])
            vals = np.interp(grid, rs, vs)
            res = pd.DataFrame({"rank_frac": grid, "value": vals})
            res["n"] = n
        else:
            (v1s, r1s, n1), (v2s, r2s, n2) = parts
            xs = np.unique(np.concatenate([v1s, v2s]))
            f1 = np.interp(xs, v1s, r1s, left=0.0, right=1.0)
            f2 = np.interp(xs, v2s, r2s, left=0.0, right=1.0)
            # a digest's CDF is 0 strictly below its min and 1 at/above
            # its max; np.interp's edge fill handles both ends given the
            # digests store rank 0 at min and rank 1 at max
            n_tot = n1 + n2
            fm = (n1 * f1 + n2 * f2) / n_tot
            out_k = (
                k
                if k is not None
                else max(len(r1s), len(r2s)) - 1
            )
            grid = np.array([i / out_k for i in range(out_k + 1)])
            vals = np.interp(grid, fm, xs)
            # exact endpoints survive the inversion regardless of CDF
            # plateaus: min/max of a union are the min/max of the mins/maxes
            vals[0] = min(v1s[0], v2s[0])
            vals[-1] = max(v1s[-1], v2s[-1])
            res = pd.DataFrame({"rank_frac": grid, "value": vals})
            res["n"] = n_tot
        for c in keys:
            res[c] = pdf[c].iloc[0]
        return res[[*keys, "rank_frac", "value", "n"]]

    if keys:
        return u.groupBy(*keys).applyInPandas(merge, out_schema)
    return u.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(
        merge, out_schema
    )
