"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv 2302.03169; public algorithm). The principled answer to "which
slice of a 100 TB raw crawl looks most like my target domain?": score
every raw document by the log importance weight of its HASHED n-gram
features under two bag-of-words models (target vs raw), perturb with
deterministic Gumbel noise, and keep the top-k — importance
RESAMPLING, which matches the target feature distribution in
expectation instead of just ranking by similarity (plain top-k by
weight over-selects the mode; the Gumbel perturbation is what makes it
a sample).

Reference seam: the reference has no selection surface at all (it
imports whole tables — `DBImportPipeline.java:54-166`); this is the
corpus-curation extension a pretraining pipeline needs.

Feature space: word unigrams + bigrams hashed into ``n_buckets``
(md5-prefix mod B — the paper's hashed generative model) — fixed-size
model tables regardless of vocabulary, the property that lets both the
target and raw models persist as ONE (bucket, c) table each through
the warehouse sink (same artifact discipline as the bigram LM / NB
models; maintenance = count addition via ``merge_feature_counts``).

Bit-exactness (repo-wide micro-log scheme): per-bucket log weights
``ln(p_target(b)) − ln(p_raw(b))`` quantize to int64 micro-logs as
model-table columns, so every per-document score is an exact integer
sum over its feature stream — aggregation-order-independent,
hash-matchable vs a SQL oracle. ``p(b) = (c_b + k) / (total + k·B)``
with add-k smoothing, each ln fed the identical double on any engine
(exact integer counts, k halves, one correctly-rounded division).
Gumbel keys derive from md5-hash uniforms (``-ln(-ln(u))``,
engine-portable, no RNG state), scaled by ``1/temperature`` micro-logs
so selection is a discrete comparison.

Scale shape: model building is one groupBy over the hashed feature
stream of a BOUNDED sample (training cost flat as the corpus grows —
the paper fits its models on samples too); scoring joins the corpus
feature stream against the B-row weight table (broadcast by
construction: B is a constant, default 4096) and ends in one groupBy
per doc; selection is one TakeOrderedAndProject top-k on scalars.
Nothing is ever |docs| x B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _feature_stream(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """One row per hashed feature OCCURRENCE: word unigrams + adjacent
    bigrams (space-split, empty-filtered — the repo tokenizer), hashed
    with xxhash64. Bucketing happens at model/score time so the stream
    itself is bucket-count-agnostic."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    uni = ws
    bi = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + F.lit(1))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cols = [F.col(id_col)] if id_col else []
    # md5-prefix feature hashing (not xxhash64): engine-portable — the
    # oracle restates the identical bucket assignment — and consistent
    # with the sampling module's portability discipline. At production
    # scale swapping in xxhash64 is a one-line change; bucket contents
    # shift but the algorithm is hash-agnostic by design.
    return df.select(*cols, F.explode(F.concat(uni, bi)).alias("_feat")).select(
        *([id_col] if id_col else []),
        F.conv(F.substring(F.md5("_feat"), 1, 8), 16, 10)
        .cast("long")
        .alias("_fh"),
    )


def dsir_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Fit one side's hashed bag-of-ngrams model: the PERSISTABLE
    ``(bucket, c)`` table — one groupBy over the hashed feature
    stream, at most ``n_buckets`` rows. Fit on a BOUNDED sample of
    each side (the paper does the same); the totals and smoothed
    probabilities derive at weight time."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    return (
        _feature_stream(df, text_col, None)
        .select(F.pmod(F.col("_fh"), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def merge_feature_counts(model: DataFrame, new_counts: DataFrame) -> DataFrame:
    """Fold a new batch's bucket counts into a persisted model —
    union + one groupBy sum, ``merge(fit(A), fit(B)) ≡ fit(A ∪ B)``
    exactly (pytest-pinned), the same maintenance contract as the LM
    and NB count tables."""
    for side, d in (("model", model), ("new_counts", new_counts)):
        if not {"bucket", "c"} <= set(d.columns):
            raise ValueError(
                f"{side} must be a dsir_feature_counts result with (bucket, c); "
                f"got {d.columns}"
            )
    return (
        model.select("bucket", "c")
        .unionByName(new_counts.select("bucket", "c"))
        .groupBy("bucket")
        .agg(F.sum("c").alias("c"))
    )


def dsir_bucket_weights(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = 4096,
    add_k: float = 0.5,
) -> DataFrame:
    """The per-bucket importance weight table:
    ``w(b) = ln(p_target(b)) − ln(p_raw(b))`` as int64 micro-logs,
    densified over ALL ``n_buckets`` buckets (buckets unseen by either
    side get the smoothed floor, so scoring never needs a null
    branch). ≤ n_buckets rows — broadcast territory by construction."""
    spark = target_counts.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))

    def side(counts: DataFrame, name: str) -> DataFrame:
        tot = counts.agg(F.sum("c").cast("long").alias(f"_tot_{name}"))
        return (
            buckets.join(
                counts.select("bucket", F.col("c").cast("long").alias(f"_c_{name}")),
                "bucket",
                "left",
            )
            .crossJoin(F.broadcast(tot))
            .select(
                "bucket",
                F.round(
                    F.log(
                        (
                            F.coalesce(F.col(f"_c_{name}"), F.lit(0)).cast("double")
                            + F.lit(add_k)
                        )
                        / (
                            F.col(f"_tot_{name}").cast("double")
                            + F.lit(add_k) * F.lit(float(n_buckets))
                        )
                    )
                    * MICRO
                )
                .cast("long")
                .alias(f"lp_{name}"),
            )
        )

    return (
        side(target_counts, "target")
        .join(side(raw_counts, "raw"), "bucket")
        .select(
            "bucket", (F.col("lp_target") - F.col("lp_raw")).alias("w_micro")
        )
    )


def dsir_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document log importance weight: the exact int64 micro-log
    sum of the document's bucket weights (one occurrence, one
    contribution). Docs with zero features are omitted (no evidence
    either way — the tokenizer contract shared with the LM/NB
    scorers). Output ``(id_col, n_feats, weight_micro)``."""
    if not {"bucket", "w_micro"} <= set(weights.columns):
        raise ValueError(
            f"weights must be a dsir_bucket_weights result with "
            f"(bucket, w_micro); got {weights.columns}"
        )
    feats = _feature_stream(df, text_col, id_col).select(
        id_col, F.pmod(F.col("_fh"), F.lit(n_buckets)).alias("bucket")
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("w_micro").cast("long").alias("weight_micro"),
        )
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    temperature: float = 1.0,
) -> DataFrame:
    """Importance RESAMPLING: perturb each document's normalized log
    weight with deterministic Gumbel noise and keep the top-``k`` —
    the Gumbel-top-k trick draws k documents WITHOUT replacement from
    the softmax of ``weight/temperature``, which is exactly the
    paper's resampling step (ranking by raw weight alone would
    over-select the single densest mode). The Gumbel key derives from
    the doc id's md5 uniform (``g = −ln(−ln(u))``) — no RNG state,
    partitioning-independent, identical in any engine — and the
    normalized weight uses the per-doc MEAN micro-log (length
    normalization, so long documents don't win by feature count
    alone). Keys quantize to int64 micro units: selection is a
    discrete comparison, ties break by id. Output
    ``(id_col, n_feats, weight_micro, key_micro, rank)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not temperature > 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    scored = dsir_scores(df, weights, text_col, id_col, n_buckets)
    # 32-bit md5 uniform shifted to the bucket CENTER — (x+0.5)/2^32 —
    # so u is strictly inside (0,1) and both ln() calls are finite for
    # every id (u=0 would NULL the key and silently drop the row)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    key = F.round(
        (
            F.col("weight_micro").cast("double")
            / F.col("n_feats").cast("double")
            / F.lit(temperature)
        )
        + gumbel * F.lit(float(MICRO))
    ).cast("long")
    return (
        scored.withColumn("key_micro", key)
        .orderBy(F.col("key_micro").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("key_micro").desc(), F.col(id_col).asc()))
            .cast("long"),
        )
    )
