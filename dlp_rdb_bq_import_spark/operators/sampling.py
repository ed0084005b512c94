"""Deterministic sampling for training-data curation.

Engine-portable by construction: the sampling predicate is a comparison
on an md5-hex prefix of the key — md5 of the same string is identical in
every engine, and hex-string comparison is lexicographic everywhere, so
the SAME rows are selected by Spark and by the ANSI-SQL oracle, with no
RNG state and no seed-propagation machinery. (Built-in ``df.sample`` is
seed-deterministic only within one engine AND one partitioning — a
re-partitioned input silently changes the sample; hash-based sampling is
partitioning-independent, the property that matters when the same
curation run executes on 10 executors today and 1000 tomorrow.)

Granularity: the fixed-fraction predicate (``sample_predicate``)
compares the first 4 hex chars (16 bits), so fractions are quantized to
1/65536 steps; data-dependent rates (``balance_classes``) use the
``hash_uniform`` helper instead — a 32-bit uniform double from the
first 8 hex chars — and ``weighted_sample`` draws 53-bit uniforms from
xxhash64 for its exponential keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PREFIX_LEN = 4  # hex chars compared → 16-bit resolution


def _bucket_bound(fraction: float) -> str:
    """The md5-prefix upper bound selecting ≈``fraction`` of keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = int(round(fraction * (16 ** _PREFIX_LEN)))
    return format(min(bound, 16 ** _PREFIX_LEN - 1), f"0{_PREFIX_LEN}x")


def sample_predicate(key: Column, fraction: float) -> Column:
    """Boolean column: md5-prefix(key) < bound. Portable to ANSI SQL as
    ``substr(md5(CAST(key AS VARCHAR)), 1, 4) < '<bound>'``."""
    return F.substring(F.md5(key.cast("string")), 1, _PREFIX_LEN) < F.lit(
        _bucket_bound(fraction)
    )


def hash_uniform(key: Column) -> Column:
    """Uniform double in [0, 1) from the key's md5 (first 8 hex chars /
    2^32) — engine-portable: render with :func:`hash_uniform_sql` for
    the ANSI oracle. Use for data-dependent rates where the fixed-bound
    ``sample_predicate`` cannot precompute its hex bound."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(4294967296.0)


def hash_uniform_sql(key_expr: str) -> str:
    """The oracle-side rendering of :func:`hash_uniform` (DuckDB/ANSI)."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
        " / 4294967296.0"
    )


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by key hash — same rows on
    every engine, every partitioning, every cluster size."""
    return df.where(sample_predicate(F.col(key_col), fraction))


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (the portable analogue of
    ``df.sampleBy``): each stratum keeps its own fraction; strata absent
    from ``fractions`` are dropped."""
    pred = F.lit(False)
    for stratum, frac in fractions.items():
        pred = F.when(
            F.col(strata_col) == stratum, sample_predicate(F.col(key_col), frac)
        ).otherwise(pred)
    return df.where(pred)


def sample_predicate_sql(key_expr: str, fraction: float) -> str:
    """The oracle-side rendering of ``sample_predicate`` (DuckDB/ANSI)."""
    return f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, {_PREFIX_LEN}) < '{_bucket_bound(fraction)}'"


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
) -> DataFrame:
    """Training-data mixture: each source sampled at its own rate (the
    up/down-weighting step that turns a raw corpus into a training mix).
    Same hash-predicate machinery as ``stratified_sample`` but with a
    default rate for unlisted sources, so a new source appearing
    upstream degrades to the default instead of silently vanishing
    (or set default_weight=0.0 to quarantine unknowns by omission,
    which is the conservative default)."""
    pred = (
        sample_predicate(F.col(key_col), default_weight)
        if default_weight > 0.0
        else F.lit(False)
    )
    for source, w in weights.items():
        pred = F.when(
            F.col(source_col) == source, sample_predicate(F.col(key_col), w)
        ).otherwise(pred)
    return df.where(pred)


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    cost_col: str,
    budgets: dict[str, int],
    default_budget: int | None = None,
) -> DataFrame:
    """Budget-bounded mixture: each group contributes documents until
    its TOKEN budget is spent, not until a row-count fraction is hit —
    the way real training mixes are specified ("30B tokens of web, 5B
    of code"). Rows order within their group by the deterministic key
    hash (ties by key), and a row is kept while the cumulative cost
    BEFORE it is under the group's budget — so the budget-crossing
    document is included and every group reaches at least its budget
    whenever supply allows. Adds ``cost_before`` (long) for audit.
    Groups absent from ``budgets`` take ``default_budget``; with the
    default ``None`` they are dropped (conservative: a new upstream
    source does not silently flood the mix).

    One window shuffle partitioned by group — the same exchange a
    per-group rank would pay; selection is engine-portable (the md5
    hash order restates in ANSI SQL via hash_uniform_sql). Skewed
    group sizes behave: the window is per-group sequential but each
    group's scan stops mattering past the budget, and groups are
    independent partitions."""
    if not budgets:
        raise ValueError("token_budget_sample: budgets must be non-empty")
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"token_budget_sample: negative budget {b} for {g!r}")
    # explicit ROWS frame: Spark's default for an ordered window is
    # RANGE (peer rows — duplicate (hash, key) orderings — would share
    # one cumulative sum), while the SQL twin emits ROWS UNBOUNDED
    # PRECEDING; pinning ROWS keeps the engines in lockstep even if
    # key_col is not unique
    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_uniform(F.col(key_col)).asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum(F.col(cost_col)).over(w) - F.col(cost_col)).cast("long")
    budget = (
        F.lit(default_budget).cast("long")
        if default_budget is not None
        else F.lit(None).cast("long")
    )
    for g, b in budgets.items():
        budget = F.when(F.col(group_col) == g, F.lit(b).cast("long")).otherwise(
            budget
        )
    return df.withColumn("cost_before", before).where(
        budget.isNotNull() & (F.col("cost_before") < budget)
    )


def token_budget_sample_sql(
    key_expr: str,
    group_expr: str,
    cost_expr: str,
    budgets: dict[str, int],
    default_budget: int | None = None,
) -> tuple[str, str]:
    """Oracle-side predicate pieces for :func:`token_budget_sample`:
    returns ``(cost_before_window_sql, budget_case_sql)`` as one
    WHERE-ready fragment pair embedded by the caller's query. Kept as
    a helper so the CASE literal and the window ORDER BY are written
    once and stay in lockstep with the Spark side."""
    cases = " ".join(
        f"WHEN '{g}' THEN CAST({b} AS BIGINT)" for g, b in budgets.items()
    )
    dflt = (
        f"CAST({default_budget} AS BIGINT)"
        if default_budget is not None
        else "CAST(NULL AS BIGINT)"
    )
    budget_sql = f"CASE {group_expr} {cases} ELSE {dflt} END"
    before_sql = (
        f"SUM({cost_expr}) OVER (PARTITION BY {group_expr} "
        f"ORDER BY {hash_uniform_sql(key_expr)}, {key_expr} "
        f"ROWS UNBOUNDED PRECEDING) - {cost_expr}"
    )
    return before_sql, budget_sql


def bottomk_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Bottom-k (KMV) sample: the ``k`` rows whose deterministic key
    hash is smallest (ties by key) — a uniform
    without-replacement sample with the property every streaming/
    distributed sampler wants: it is MERGEABLE.
    ``bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))``, so
    partitions, micro-batches and standing samples fold exactly
    (Bar-Yossef et al. 2002's KMV sketch; the k-th smallest hash also
    estimates distinct keys as (k−1)/h_k — see
    :func:`kmv_distinct_estimate`). Unlike ``weighted_sample``'s A-ES
    keys (xxhash64, Spark-only), the hash here is the engine-portable
    md5 uniform, so the selected SET hash-matches an ANSI
    ``ORDER BY hash LIMIT k`` oracle.

    Output: the input columns plus ``hkey`` (the uniform, kept because
    the merge/fold and the estimator need it; a 32-bit integer over
    2^32 is exact in binary64, so it hash-matches cross-engine with no
    rounding).

    Scale shape: sort-limit plans as TakeOrderedAndProject —
    per-partition top-k then a k-sized merge on the driver side of
    the exchange; no global sort materializes, no SinglePartition
    window."""
    if k < 1:
        raise ValueError(f"bottomk_sample: k must be >= 1, got {k}")
    h = hash_uniform(F.col(key_col))
    return (
        df.withColumn("hkey", h)
        .orderBy(F.col("hkey").asc(), F.col(key_col).asc())
        .limit(k)
    )


def merge_bottomk(standing: DataFrame, batch: DataFrame, key_col: str, k: int) -> DataFrame:
    """Fold a new batch's bottom-k sample into the standing one: union
    and re-take the k smallest — exactly ``bottomk`` over everything
    seen (the KMV merge property; pytest-pinned ≡ rebuild). State is
    k rows forever."""
    return (
        standing.unionByName(batch)
        .orderBy(F.col("hkey").asc(), F.col(key_col).asc())
        .limit(k)
    )


def kmv_distinct_estimate(sample: DataFrame, k: int) -> DataFrame:
    """KMV distinct-count estimator from a :func:`bottomk_sample`:
    ``(k-1) / h_k`` with ``h_k`` the largest retained hash
    (Bar-Yossef et al. 2002) — the cheap companion to the HLL sketch
    when a bottom-k sample is already being maintained. When the
    sample holds fewer than ``k`` rows the population was smaller
    than ``k`` and the exact count is returned. Output one row:
    ``(n_retained, est_distinct)``."""
    agg = sample.agg(
        F.count(F.lit(1)).alias("n_retained"),
        F.max("hkey").alias("_hk"),
    )
    return agg.select(
        F.col("n_retained").cast("long").alias("n_retained"),
        F.when(F.col("n_retained") < k, F.col("n_retained").cast("double"))
        .otherwise(
            F.round((F.lit(k) - 1).cast("double") / F.col("_hk"), 3)
        )
        .alias("est_distinct"),
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.8,
    val: float = 0.1,
    out: str = "split",
) -> DataFrame:
    """Deterministic three-way corpus split by key hash: the same row
    lands in the same split on every engine, partitioning, and cluster
    size — re-running the pipeline never leaks val/test rows into
    train. Remaining mass (1 - train - val) is 'test'."""
    if train + val > 1.0:
        raise ValueError(f"train + val must be <= 1, got {train + val}")
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, _PREFIX_LEN)
    return df.withColumn(
        out,
        F.when(h < F.lit(_bucket_bound(train)), "train")
        .when(h < F.lit(_bucket_bound(train + val)), "val")
        .otherwise("test"),
    )


def train_val_test_split_sql(key_expr: str, train: float = 0.8, val: float = 0.1) -> str:
    """Oracle-side rendering of ``train_val_test_split``'s label."""
    return (
        f"CASE WHEN substr(md5(CAST({key_expr} AS VARCHAR)), 1, {_PREFIX_LEN}) < '{_bucket_bound(train)}' THEN 'train' "
        f"WHEN substr(md5(CAST({key_expr} AS VARCHAR)), 1, {_PREFIX_LEN}) < '{_bucket_bound(train + val)}' THEN 'val' "
        f"ELSE 'test' END"
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Per-group document cap — the web-curation stage that stops one
    domain/source from dominating a training mix: keep at most ``cap``
    rows per group, preferring high ``order_col`` (e.g. quality score),
    ties and the default broken by key hash so the kept set is
    deterministic and partitioning-independent (same property as the
    samplers above; plain ``doc_id`` order would bias toward early
    crawls).

    One window over a single shuffle on ``group_col``; at 100 TB the
    heavy tail (millions of rows in one domain) is exactly the skew AQE
    splits, and the rank predicate prunes to ``cap`` rows per group
    before anything joins downstream.
    """
    from pyspark.sql.window import Window

    order = []
    if order_col is not None:
        c = F.col(order_col)
        order.append(c.desc() if descending else c.asc())
    order.append(F.md5(F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
    strata: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES, public algorithm): each row gets the score
    ``u^(1/w)`` for a deterministic uniform ``u`` derived from
    xxhash64(key, salt); the top-k scores are the sample. Inclusion
    probability rises with weight exactly as sequential weighted
    draws-without-replacement would give; changing ``salt`` redraws.

    Deterministic and partitioning-independent (the score depends only
    on key+salt+weight), so re-runs and retries pick the same rows —
    the property every other sampler in this module guarantees, kept
    for the weighted case. Top-k is TakeOrderedAndProject (global) or
    a per-stratum window — no global sort of the full table. Rows with
    non-positive or null weight are excluded (u^(1/w) is undefined).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # u from the hash's low 53 bits (the full double mantissa): ties on
    # u are ~2^-53, so the key-asc tiebreak cannot systematically favor
    # low keys even at billions of rows (a 1e6-bucket pmod here would
    # make score ties common past ~1e5 rows and bias the sample).
    mant = (1 << 53) - 1
    u = (
        F.xxhash64(F.col(key_col), F.lit(salt)).bitwiseAND(F.lit(mant)).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 53))
    w = F.col(weight_col).cast("double")
    scored = df.where(w.isNotNull() & (w > 0)).withColumn(
        "_score", F.pow(u, F.lit(1.0) / w)
    )
    if strata:
        win = Window.partitionBy(*strata).orderBy(
            F.col("_score").desc(), F.col(key_col).asc()
        )
        return (
            scored.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") <= k)
            .drop("_rn", "_score")
        )
    return (
        scored.orderBy(F.col("_score").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("_score")
    )


def balance_classes(
    df: DataFrame,
    *,
    key_col: str,
    class_col: str,
    target: int | None = None,
) -> DataFrame:
    """Deterministic class rebalancing by undersampling — the training-
    set preparation step for skewed label distributions: every class is
    kept at ≈``target`` rows (default: the minority class size), chosen
    by the portable md5-hash predicate so the kept set is identical on
    any engine, partitioning, or cluster size (seeded df.sampleBy is
    neither).

    A class at or under target keeps every row (rate clamps to 1).
    The per-row test is ``u < target/count`` with ``u`` drawn by
    :func:`hash_uniform` — one exact integer division and one IEEE
    comparison, portable to ANSI SQL verbatim.

    A NULL class label is a real class: it participates in the counts
    AND keeps its (sampled) rows — the rate attach is null-safe, so no
    row is silently lost.

    Scale shape: one partial-agg class count (|classes| rows), a
    broadcast rate join, and a scan-local predicate — no shuffle of
    the data itself, no sort, no window.
    """
    reserved = {"_cnt", "_rate", "_target"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    from .common import null_safe_group_join

    counts = df.groupBy(class_col).agg(F.count("*").alias("_cnt"))
    if target is None:
        tgt = counts.agg(F.min("_cnt").alias("_target"))
        rates = counts.crossJoin(F.broadcast(tgt))
    else:
        rates = counts.withColumn("_target", F.lit(int(target)))
    rates = rates.select(
        class_col,
        F.least(
            F.lit(1.0), F.col("_target").cast("double") / F.col("_cnt").cast("double")
        ).alias("_rate"),
    )
    return (
        null_safe_group_join(df, rates, [class_col])
        .where(hash_uniform(F.col(key_col)) < F.col("_rate"))
        .drop("_rate")
    )


def temperature_weights(
    df: DataFrame, source_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-based mixture weights from the data itself: each
    source's sampling rate ∝ n^(alpha-1), normalized so the SMALLEST
    source keeps everything (rate 1.0) — the multilingual/multi-source
    rebalancing rule (rate ∝ size^(α-1) ⇒ sampled mass ∝ size^α; α=1
    is proportional/no-op, α→0 approaches uniform-over-sources;
    public recipe from the multilingual-pretraining literature). Pure
    downsampling: no rate exceeds 1, so no replication is implied.

    Output ``(source_col, n_docs, rate)``, rate rounded to 9.
    α = 0.5 computes via sqrt (IEEE-correctly-rounded in every engine,
    so the rates hash-match an oracle); other α use ``pow``, whose
    last-ulp behavior is libm-specific — fine for production, excluded
    from the hash-matched query by design.

    Scale shape: one partial-aggregated groupBy to source counts
    (sources-sized table), a 1-row min scalar attach, arithmetic.
    """
    if alpha <= 0.0 or alpha > 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    nmin = counts.agg(F.min("n_docs").alias("_nmin"))
    j = counts.crossJoin(F.broadcast(nmin))
    if alpha == 0.5:
        rate = F.sqrt(
            F.col("_nmin").cast("double") / F.col("n_docs").cast("double")
        )
    else:
        rate = F.pow(
            F.col("n_docs").cast("double") / F.col("_nmin").cast("double"),
            F.lit(alpha - 1.0),
        )
    return j.select(source_col, "n_docs", F.round(rate, 9).alias("rate"))


def temperature_mixture_sample(
    df: DataFrame, key_col: str, source_col: str, alpha: float = 0.5
) -> DataFrame:
    """Sample the corpus at its :func:`temperature_weights` rates —
    rates come from the DATA (no driver round-trip: the sources-sized
    weight table broadcast-joins back and the hash-uniform predicate
    compares per row), so the operator composes into one plan. Keeps
    the input columns."""
    w = temperature_weights(df, source_col, alpha)
    return (
        df.join(F.broadcast(w), source_col)
        .where(hash_uniform(F.col(key_col)) < F.col("rate"))
        .drop("n_docs", "rate")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    out: str = "split",
) -> DataFrame:
    """Near-dup-aware train/val/test split: transitive closure over
    the duplicate ``pairs`` graph (``dedup.duplicate_clusters``), then
    every document splits by its CLUSTER representative's hash — so a
    near-duplicate family always lands in ONE split and eval can never
    see a paraphrase of a training row (the leakage a naive per-doc
    hash split silently allows). Docs absent from the pair graph are
    their own singleton cluster. Adds ``cluster_id`` and ``out``.

    The pair graph is the near-dup EDGE set — orders of magnitude
    smaller than the corpus — so the closure runs on the graph and the
    corpus pays one left join against the (doc→cluster) labels."""
    from .dedup import duplicate_clusters

    clusters = duplicate_clusters(pairs)
    if id_col != "doc_id":
        clusters = clusters.withColumnRenamed("doc_id", id_col)
    joined = df.join(clusters, id_col, "left")
    labeled = joined.withColumn(
        "cluster_id",
        F.coalesce(F.col("cluster_id"), F.col(id_col).cast("long")),
    )
    return train_val_test_split(labeled, "cluster_id", train, val, out)


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 12,
    cap: int = 50,
) -> DataFrame:
    """Cluster-balanced coreset selection (the DataComp/SemDeDup-family
    "balance the embedding space" recipe, public): partition the
    corpus into ``k`` cells around GREEDY K-CENTER representatives
    (similarity.kcenter_sample — coverage-maximizing, deterministic),
    assign every vector to its nearest center, and keep at most
    ``cap`` vectors per cell — the ``cap`` CLOSEST to the center, so
    each kept cell is a tight, equally-sized neighborhood and no dense
    region dominates the sample.

    Exactness: assignment and ranking both run on EXACT INT64 squared
    distances over the quantized vectors (QUANT_SCALE) — every argmin
    and every rank is a discrete comparison (assignment ties break to
    the lowest pick_order, rank ties to the lowest id), so the full
    pipeline hash-matches a SQL oracle that replays the same center
    sequence (the kcenter recursive-CTE oracle composes underneath).

    Scale shape: the center table is ≤ k ≤ 256 rows (kcenter_sample's
    own bound) and broadcasts; the corpus streams through ONE stage
    computing k fold-dots per row (the k-row broadcast nested loop is
    bounded by construction), then one per-vector argmin window over k
    scalar rows and one per-cell top-``cap`` window on scalars. No
    corpus self-join anywhere.

    Output: ``(id_col, cell, dist2, cell_rank)`` — cell the center's
    pick_order, dist2 the exact squared distance in quantized units.
    """
    from .similarity import _quantize, kcenter_sample

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    centers = kcenter_sample(df, vec_col, id_col, k)
    cent = (
        df.join(centers, id_col)
        .select(
            F.col("pick_order").alias("cell"),
            _quantize(F.col(vec_col)).alias("_cv"),
        )
    )
    x = df.select(F.col(id_col), _quantize(F.col(vec_col)).alias("_qv"))
    d2 = F.aggregate(
        F.zip_with("_qv", "_cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    assigned = x.crossJoin(F.broadcast(cent)).select(
        id_col, "cell", d2.alias("dist2")
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("dist2").asc(), F.col("cell").asc()
    )
    nearest = (
        assigned.withColumn("_rk", F.row_number().over(w_assign))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
    w_cell = Window.partitionBy("cell").orderBy(
        F.col("dist2").asc(), F.col(id_col).asc()
    )
    return (
        nearest.withColumn("cell_rank", F.row_number().over(w_cell).cast("long"))
        .where(F.col("cell_rank") <= cap)
        .select(id_col, "cell", "dist2", "cell_rank")
    )


def kmv_overlap_estimate(
    sample_a: DataFrame,
    sample_b: DataFrame,
    key_col: str,
    k: int,
) -> DataFrame:
    """Set-overlap estimation from two bottom-k (KMV) samples — the
    Beyer et al. (SIGMOD 2007) distinct-value synopsis algebra:
    given :func:`bottomk_sample`\\ s of key sets A and B, estimate
    Jaccard, |A∪B| and |A∩B| WITHOUT touching the underlying data —
    the audience-overlap / cross-corpus-contamination readout two
    maintained samples give for free.

    Method: the k smallest distinct hashes of the MERGED samples are
    exactly bottom-k of A∪B (the KMV merge property); within that
    union synopsis the fraction of keys present in BOTH input samples
    is an unbiased Jaccard estimate, |A∪B| comes from the synopsis's
    k-th hash ((K−1)/h_K, exact below k), and |A∩B| = Ĵ·|A∪B|̂.
    Output one row:

    ``(n_union_sample, jaccard, est_union, est_intersection)``

    — jaccard/est rounded to (9, 3, 3). Deterministic: the md5
    uniform makes every quantity a pure function of the key sets, so
    the whole readout hash-matches an ANSI oracle (unlike HLL
    intersection, which has no cross-engine-exact form).

    Scale shape: inputs are k-row synopses — everything here is
    synopsis-sized (two broadcast semi-joins + one k-row sort-limit +
    a 1-row aggregate); the corpus was only touched when the samples
    were built/folded."""
    if k < 1:
        raise ValueError(f"kmv_overlap_estimate: k must be >= 1, got {k}")
    a_keys = sample_a.select(F.col(key_col), F.col("hkey")).distinct()
    b_keys = sample_b.select(F.col(key_col), F.col("hkey")).distinct()
    union_k = (
        a_keys.unionByName(b_keys)
        .distinct()
        .orderBy(F.col("hkey").asc(), F.col(key_col).asc())
        .limit(k)
    )
    flagged = (
        union_k.join(
            a_keys.select(F.col(key_col), F.lit(1).alias("_ina")),
            key_col,
            "left",
        )
        .join(
            b_keys.select(F.col(key_col), F.lit(1).alias("_inb")),
            key_col,
            "left",
        )
        .select(
            "hkey",
            (
                F.coalesce(F.col("_ina"), F.lit(0))
                * F.coalesce(F.col("_inb"), F.lit(0))
            ).alias("_both"),
        )
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_union_sample"),
        F.sum("_both").alias("_nboth"),
        F.max("hkey").alias("_hk"),
    )
    jacc = F.col("_nboth").cast("double") / F.col("n_union_sample").cast("double")
    est_union = F.when(
        F.col("n_union_sample") < k, F.col("n_union_sample").cast("double")
    ).otherwise((F.lit(k) - 1).cast("double") / F.col("_hk"))
    return agg.select(
        F.col("n_union_sample").cast("long").alias("n_union_sample"),
        F.round(jacc, 9).alias("jaccard"),
        F.round(est_union, 3).alias("est_union"),
        F.round(jacc * est_union, 3).alias("est_intersection"),
    )


def skyline(
    df: DataFrame,
    *,
    minimize: list[str] | None = None,
    maximize: list[str] | None = None,
) -> DataFrame:
    """Skyline / Pareto-optimal selection (Börzsönyi, Kossmann &
    Stocker, ICDE 2001): keep exactly the rows no other row dominates,
    where row b dominates row a when b is ≤ a on every minimized
    dimension, ≥ on every maximized one, and strictly better on at
    least one. The multi-objective curation primitive ("cheapest for
    its quality tier" / "highest quality for its length budget") that
    no single ORDER BY can express. All input columns pass through;
    duplicate-coordinate rows never dominate each other, so the
    skyline SET is unique and deterministic.

    Distributed shape (the published partition-and-merge identity:
    ``skyline(S) = skyline(∪ᵢ skyline(Pᵢ))`` — dominance is
    transitive, so a locally dominated row is globally dominated):
    phase 1 computes each partition's local skyline with a vectorized
    numpy filter inside ``mapInPandas`` (rows stream per Arrow batch;
    candidates accumulate per partition), phase 2 repeats the same
    filter once over the UNION of local skylines on one partition —
    bounded by the global skyline's size times the partition count,
    the anti-correlated worst case the caller controls by dimension
    choice (2-4 dims keep skylines tiny; every-dim-skylines degenerate
    to the full table by definition, not by plan).

    Exactness: pure comparisons — no arithmetic at all; NULL in any
    skyline dimension drops the row (incomparable)."""
    mins = list(minimize or [])
    maxs = list(maximize or [])
    dims = mins + maxs
    if not dims:
        raise ValueError("skyline: need at least one minimize/maximize column")
    dupes = {d for d in dims if dims.count(d) > 1}
    if dupes:
        raise ValueError(f"skyline: duplicate dimension columns {sorted(dupes)}")
    missing = [d for d in dims if d not in df.columns]
    if missing:
        raise ValueError(f"skyline: columns not in input: {missing}")

    import numpy as np
    import pandas as pd

    cols = df.columns
    sgn = {**{c: 1.0 for c in mins}, **{c: -1.0 for c in maxs}}

    def _local_skyline(pdf: pd.DataFrame) -> pd.DataFrame:
        # all-minimize normalized coordinate matrix
        m = np.column_stack(
            [pdf[c].to_numpy(dtype=float) * sgn[c] for c in dims]
        )
        n = len(pdf)
        keep = np.ones(n, dtype=bool)
        # sort by coordinate sum: a dominator always has a <= sum, so
        # each row need only be checked against earlier kept rows
        order = np.argsort(m.sum(axis=1), kind="mergesort")
        kept_rows: list[int] = []
        for idx in order:
            row = m[idx]
            dominated = False
            for j in kept_rows:
                other = m[j]
                if (other <= row).all() and (other < row).any():
                    dominated = True
                    break
            if dominated:
                keep[idx] = False
            else:
                kept_rows.append(idx)
        return pdf[keep]

    def _phase(it):
        for pdf in it:
            if len(pdf):
                pdf = pdf.dropna(subset=dims)
            if len(pdf):
                yield _local_skyline(pdf)

    local = df.dropna(subset=dims).mapInPandas(_phase, schema=df.schema)

    def _merge(it):
        batches = [pdf for pdf in it if len(pdf)]
        if batches:
            yield from _phase([pd.concat(batches, ignore_index=True)])

    # phase 2: one pass over the union of local skylines (bounded by
    # |skyline| x partitions — the merge identity makes this exact)
    return local.coalesce(1).mapInPandas(_merge, schema=df.schema)
