"""Shuffle-discipline join utilities for the 100 TB posture.

Two techniques the mission calls for beyond what AQE gives for free:

- **Bucketed co-located joins** — persist both sides bucketed by the
  join key (``bucketBy`` + ``saveAsTable``); Spark then joins bucket i
  against bucket i with NO exchange on either side. For fact tables that
  are joined on the same key repeatedly (orders ⋈ lineitem every run),
  paying one bucketed write amortizes away every subsequent shuffle —
  at 100 TB the shuffle IS the job, so this is the single biggest lever
  a pipeline owner controls.

- **Salted skew joins** — when one key is pathologically hot (the
  "null customer", the empty document), AQE's skew splitting helps
  sort-merge joins but replicating the dimension side N ways and
  spreading the hot fact rows across N salt values bounds EVERY
  partition by construction. Exact same join result, no 2 GB partition
  limit violations, no straggler task.

Both are plan-shape-verified in tests (the bucketed join's physical plan
must contain no Exchange; the salted join must produce exactly the
plain-join result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a DataFrame bucketed (and optionally sorted) by the join
    key. Subsequent equi-joins between tables bucketed the same way on
    the same key run exchange-free. ``path`` makes it an external table
    (data at an explicit location instead of the session warehouse)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed saved tables; Catalyst recognizes the
    bucketing and plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def _check_reserved(op: str, reserved: tuple[str, ...], *dfs: DataFrame) -> None:
    """Raise when an input already uses one of the operator's internal
    column names — otherwise the name is silently replaced by
    ``withColumn`` and then dropped (the same explicit-collision
    discipline as the payload-column clash checks)."""
    for df in dfs:
        clash = sorted(set(df.columns) & set(reserved))
        if clash:
            raise ValueError(
                f"{op}: input columns {clash} collide with reserved internal "
                f"names {sorted(reserved)}; rename them before calling"
            )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a deterministic salt in
    [0, salt) (hash of the whole row via monotonically increasing id is
    NOT deterministic — we hash the key plus a per-row uniform draw from
    xxhash64 of all columns), the dimension side is replicated ``salt``
    ways, and the join key becomes (key, salt). Result rows are exactly
    those of ``facts.join(dim, on, how)`` for the supported ``how``
    values; every hot key's rows spread over ``salt`` partitions
    instead of one.

    Supported ``how``: inner, left/left_outer, left_semi, left_anti —
    the fact-preserving joins, where replicating the dim side cannot
    invent rows. right/full outer are rejected: an unmatched dim row
    exists ``salt`` times in the replicated side and would be emitted
    once per salt value; use AQE skew handling or pre-aggregate the dim
    side for those.

    Use when one side is small enough to replicate ``salt``× but too
    big (or too skew-prone) to broadcast outright; for genuinely small
    dims, ``F.broadcast`` remains the first choice.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — a replicated dim side would emit unmatched dim "
            f"rows {salt}x under right/full outer"
        )
    _check_reserved("salted_join", ("_salt",), facts, dim)
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*facts.columns), F.lit(salt)).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_facts.join(exploded_dim, [on, "_salt"], how)
    return out.drop("_salt")


def _ts_micros(col: F.Column, dtype: str) -> F.Column:
    """Numeric image of a time-ish column for arithmetic/bucketing:
    timestamps (zoned or NTZ — the cast is linear under the session's
    pinned UTC zone) become epoch microseconds, numerics pass through."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    how: str = "left",
) -> DataFrame:
    """As-of join — for each left row, the single right row with the
    greatest ``right_ts <= left_ts`` (backward) or smallest
    ``right_ts >= left_ts`` (forward) within the same key group.

    Spark has no native as-of join (reference lacks one too; pandas
    ``merge_asof`` and kdb ``aj`` define the semantics). The classic
    distributed implementation is NOT a join at all: tag both sides,
    union them, and run one ``last(..., ignorenulls=True)`` window over
    the merged time-sorted stream. One shuffle on the key, one per-key
    sort, zero pairwise candidate pairs — at 100 TB this is the only
    shape that survives, because any join-based formulation (range
    bucketing included) re-materializes quote×probe candidates.

    Ties on ``right_ts`` within a key pick the row with the largest
    payload struct (deterministic, partitioning-independent); exact
    ``right_ts == left_ts`` matches are included. ``tolerance_us``
    bounds the match distance in microseconds (timestamp inputs) or
    plain units (numeric inputs). ``how='left'`` keeps unmatched left
    rows with null right columns; ``'inner'`` drops them.

    Right-side columns collide-proofed with an ``r_`` prefix when the
    name already exists on the left.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    _check_reserved("asof_join", ("_t", "_probe", "_q", "_lrow", "_m"), left, right)

    ldt = dict(left.dtypes)[left_ts]
    rdt = dict(right.dtypes)[right_ts]
    payload_cols = [c for c in right.columns if c not in keys]
    out_names = {c: (c if c not in left.columns else f"r_{c}") for c in payload_cols}

    l2 = left.select(
        *keys,
        _ts_micros(F.col(left_ts), ldt).alias("_t"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(1).alias("_probe"),
        F.lit(None)
        .cast(right.select(F.struct(*payload_cols).alias("_q")).schema["_q"].dataType)
        .alias("_q"),
    )
    r2 = right.select(
        *keys,
        _ts_micros(F.col(right_ts), rdt).alias("_t"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        F.lit(0).alias("_probe"),
        F.struct(*payload_cols).alias("_q"),
    )
    merged = l2.unionByName(r2)

    # Quotes sort before probes at equal _t (exact matches included);
    # among equal-_t quotes the LAST in window order wins, so _q asc
    # makes the pick the max payload struct, deterministically.
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_probe").asc(), F.col("_q").asc()]
    else:
        order = [F.col("_t").desc(), F.col("_probe").asc(), F.col("_q").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = merged.withColumn(
        "_m", F.last("_q", ignorenulls=True).over(w)
    ).where(F.col("_probe") == 1)

    if tolerance_us is not None:
        mt = _ts_micros(F.col("_m")[right_ts], rdt)
        dist = (F.col("_t") - mt) if direction == "backward" else (mt - F.col("_t"))
        matched = matched.withColumn(
            "_m", F.when(dist <= F.lit(tolerance_us), F.col("_m"))
        )
    if how == "inner":
        matched = matched.where(F.col("_m").isNotNull())

    return matched.select(
        F.col("_lrow.*"),
        *[F.col("_m")[c].alias(out_names[c]) for c in payload_cols],
    )


def range_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bucket: int,
    on: str | list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join ([ls,le] ∩ [rs,re] ≠ ∅, optionally sharing
    equi-keys) without a cartesian product.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin /
    CartesianProduct — O(n·m) and dead at scale. The standard fix
    (Databricks' range-join optimization, re-derived here on public
    semantics) is binning: explode each interval into the fixed-width
    buckets it covers, equi-join on bucket id (+ keys), then verify the
    exact overlap predicate. Each matching pair is attributed to the
    single bucket containing max(ls, rs), so no post-join distinct is
    needed — the join stays a plain hash/sort-merge exchange whose
    width is bounded by bucket occupancy, not n·m.

    ``bucket`` is in microseconds for timestamp range columns (plain
    units for numerics); pick it near the median interval length —
    too small explodes rows (len/bucket copies per interval), too big
    degrades toward all-pairs within a bucket. Intervals with
    end < start are dropped (they overlap nothing by definition, and
    Spark's ``sequence`` would silently generate a DESCENDING bucket
    list for them). ``how='inner'`` only: outer variants would need
    unmatched-side bookkeeping across buckets.

    Column names (other than ``on`` keys) must be disjoint between the
    two sides; violations raise rather than silently aliasing.
    """
    if how != "inner":
        raise ValueError("range_overlap_join supports how='inner' only")
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"column name collision outside join keys: {sorted(clash)}; "
            "rename one side before joining"
        )
    _check_reserved("range_overlap_join", ("_ls", "_le", "_rs", "_re", "_bkt"), left, right)
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    ls = _ts_micros(F.col(left_range[0]), ldt[left_range[0]])
    le = _ts_micros(F.col(left_range[1]), ldt[left_range[1]])
    rs = _ts_micros(F.col(right_range[0]), rdt[right_range[0]])
    re = _ts_micros(F.col(right_range[1]), rdt[right_range[1]])

    lb = (
        left.withColumn("_ls", ls)
        .withColumn("_le", le)
        .where(F.col("_le") >= F.col("_ls"))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col("_ls") / bucket), F.floor(F.col("_le") / bucket)
                )
            ),
        )
    )
    rb = (
        right.withColumn("_rs", rs)
        .withColumn("_re", re)
        .where(F.col("_re") >= F.col("_rs"))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col("_rs") / bucket), F.floor(F.col("_re") / bucket)
                )
            ),
        )
    )
    joined = lb.join(rb, keys + ["_bkt"], "inner").where(
        (F.col("_ls") <= F.col("_re"))
        & (F.col("_rs") <= F.col("_le"))
        & (F.floor(F.greatest(F.col("_ls"), F.col("_rs")) / bucket) == F.col("_bkt"))
    )
    return joined.drop("_ls", "_le", "_rs", "_re", "_bkt")


def bloom_filtered_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
) -> DataFrame:
    """Bloom-prefiltered semi-join — the classic big-join shuffle
    reducer made first-class: build a Bloom filter over the SMALL
    side's keys (one-row dense bitmap, broadcast as a scalar attach),
    screen the big side INSIDE its scan with O(1) codegen bit probes,
    then run the exact semi-join over the survivors. The result is
    EXACTLY the plain semi-join — a Bloom has no false negatives, so
    every true match survives the screen, and false positives die in
    the exact join behind it; the filter only shrinks what reaches
    the shuffle (at fpp ≈ 0.24%, a 99%-selective semi-join moves
    ~1/100th the bytes).

    Spark's own runtime bloom (spark.sql.optimizer.runtime.bloomFilter)
    does this adaptively inside one query; the explicit operator
    exists for what the optimizer cannot do — persist the bitmap once
    and reuse it across MANY queries/batches (the decontam index
    discipline), or screen before an expensive non-join stage.

    Reuses the decontam module's Kirsch-Mitzenmacher bitmap
    (build_hash_bloom / bloom_might_contain). NULL big-side keys may
    pass the screen but never match the exact semi-join — same
    semantics as the plain join."""
    from .decontam import bloom_might_contain, build_hash_bloom

    sk = small_key or big_key
    clash = sorted(set(big.columns) & {"_h", "_bloom"})
    if clash:
        raise ValueError(
            f"bloom_filtered_semi_join: big-side columns {clash} collide "
            "with reserved internal names ['_bloom', '_h']; rename them "
            "before calling"
        )
    # xxhash64 is type-dependent (INT 5 and BIGINT 5 hash differently), so
    # hashing the two key columns on their native types would let equal
    # values miss the screen — a silent false negative that breaks the
    # "EXACTLY the plain semi-join" contract. Hash both sides through a
    # common STRING rendering instead; the exact semi-join behind the
    # screen still compares native values.
    hashes = small.select(F.xxhash64(F.col(sk).cast("string")).alias("_h"))
    bloom, m_bits = build_hash_bloom(hashes)
    screened = (
        big.withColumn("_h", F.xxhash64(F.col(big_key).cast("string")))
        .crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain(F.col("_h"), m_bits))
        .drop("_h", "_bloom")
    )
    return screened.join(
        small.select(F.col(sk).alias(big_key)).distinct(), big_key, "leftsemi"
    )
