"""ML feature-engineering operators: smoothed target encoding, the
hashing trick for bag-of-words vectors, and isotonic (PAV) score
calibration.

The reference has no feature surface (its DLP pipeline ships values
verbatim, BigQueryTableRowDoFn.java:33-48); these are north-star
operators for the model-training side of a curation pipeline: target
encoding replaces high-cardinality categoricals before tabular model
training, feature hashing fixes the dimensionality of unbounded token
vocabularies without a vocabulary build, and isotonic regression is
the standard post-hoc calibrator for the quality/classifier scores
this engine trains (the monotone upgrade of calibration_curve's
fixed-bin diagnosis).

Scale posture
-------------
``target_encode`` is one category-grain aggregation plus a 1-row
global attach — map-side combine everywhere. ``hashed_features`` is
explode → (id, bucket) aggregation, the text_analysis shape; the
output is bounded by min(tokens, dim) per doc regardless of
vocabulary. ``isotonic_fit`` groups to DISTINCT scores first (the
classifier_auc contract — score_round caps raw continuous domains)
and runs PAV once over that bounded table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: int = 10,
    unit_scale: int = 100,
) -> DataFrame:
    """Smoothed mean target encoding of a categorical column
    (Micci-Barreca, SIGKDD Explorations 2001): each category maps to
    ``(Σy + m·ȳ_global)/(n + m)`` — the shrinkage estimator that keeps
    rare categories from memorizing their few labels (as raw per-
    category means would) while letting frequent ones approach their
    own mean. One row per category: ``(category (string), n (long),
    enc (double))``.

    Exactness: targets quantize to integers at ``unit_scale`` (100 =
    cents, exact for 2-decimal money); with N the global row count
    and T the global unit sum, the encoding equals
    ``(N·Σy + m·T) / (N·(n + m)·unit_scale)`` — numerator and
    denominator both exact DECIMAL(38,0)/HUGEINT integers, ONE IEEE
    division, engine-identical with no rounding step. NULL
    categories/targets are excluded.

    Scale shape: one category-grain aggregation (map-side combine) and
    a broadcast 1-row global attach — no windows, no row-grain join."""
    if smoothing < 0:
        raise ValueError(f"target_encode: smoothing must be >= 0, got {smoothing}")
    if unit_scale < 1:
        raise ValueError(f"target_encode: unit_scale must be >= 1, got {unit_scale}")
    base = df.select(
        F.col(cat_col).cast("string").alias("_cat"),
        F.round(F.col(target_col).cast("double") * F.lit(unit_scale))
        .cast("long")
        .alias("_y"),
    ).where(F.col("_cat").isNotNull() & F.col("_y").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = base.groupBy("_cat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("decimal(38,0)").alias("_sy"),
    )
    glob = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_nn"),
        F.sum("_y").cast("decimal(38,0)").alias("_t"),
    )
    m = F.lit(smoothing).cast("decimal(38,0)")
    num = F.col("_nn") * F.col("_sy") + m * F.col("_t")
    den = (
        F.col("_nn")
        * (dec("n") + m)
        * F.lit(unit_scale).cast("decimal(38,0)")
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            F.col("_cat").alias("category"),
            "n",
            (num.cast("double") / den.cast("double")).alias("enc"),
        )
    )


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
) -> DataFrame:
    """Hashing-trick bag-of-words features (Weinberger et al., ICML
    2009): every token hashes to one of ``dim`` buckets with a ±1 sign
    hash, and the feature value is the signed count — fixed
    dimensionality with no vocabulary build, no dictionary shuffle,
    and unbiased inner products (the sign hash cancels collision
    bias in expectation). Long-form sparse output: one row per
    ``(doc, bucket)`` with nonzero value — ``(id, bucket (long),
    value (long))``.

    Portable hashing: bucket = first 8 md5 hex chars of the token mod
    ``dim``; sign = parity of the 9th hex char — both engine-portable
    (the deterministic_sample md5 discipline), so a SQL oracle states
    the identical expressions. Tokens are single-space splits of the
    lowercased text (the fixture-text convention token_count pins);
    empty tokens drop. Exact-zero features (collision cancellation)
    are filtered — the sparse convention.

    Scale shape: explode → (id, bucket) aggregation with map-side
    combine; output ≤ min(n_tokens, dim) rows per doc regardless of
    vocabulary size."""
    if dim < 1:
        raise ValueError(f"hashed_features: dim must be >= 1, got {dim}")
    tok = F.explode(
        F.split(F.lower(F.col(text_col)), " ")
    ).alias("_tok")
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), tok)
        .where(F.col("_tok") != "")
    )
    h = F.md5(F.col("_tok"))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(dim)
    ).alias("bucket")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select("id", bucket, sign.alias("_s"))
        .groupBy("id", "bucket")
        .agg(F.sum("_s").cast("long").alias("value"))
        .where(F.col("value") != 0)
    )


def hashed_features_sql(
    table: str, id_expr: str, text_expr: str, dim: int
) -> str:
    """The oracle-side (DuckDB/ANSI) rendering of
    :func:`hashed_features` — identical md5 bucket/sign expressions."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS id, t.tok AS tok
  FROM {table},
       LATERAL unnest(string_split(lower({text_expr}), ' ')) AS t(tok)
  WHERE {text_expr} IS NOT NULL AND t.tok <> ''
), hashed AS (
  SELECT id,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {dim} AS bucket,
         CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM toks
)
SELECT id, bucket, CAST(SUM(s) AS BIGINT) AS value
FROM hashed GROUP BY id, bucket
HAVING SUM(s) <> 0
"""


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    score_round: int | None = None,
) -> DataFrame:
    """Isotonic regression of a binary label on a score via
    pool-adjacent-violators (Ayer et al., Ann. Math. Stat. 1955;
    Zadrozny & Elkan KDD 2002 for classifier calibration): the
    least-squares MONOTONE fit — the nonparametric upgrade of
    :func:`calibration_curve`'s fixed deciles (bins adapt to where
    the score actually violates monotonicity; the fitted value IS the
    calibrated probability). One row per distinct score: ``(score
    (double), n (long), pos (long), iso_rate (double))`` with
    ``iso_rate`` non-decreasing in score.

    Algorithm: group to DISTINCT scores (exact integer ``(n, Σy)``
    per score), then one PAV pass over that bounded table — pools are
    ``(weight, sum)`` pairs merged while the rate decreases, so each
    pool's rate is ONE exact-integer division (engine-deterministic;
    no float accumulation). PAV is inherently sequential, but its
    input is the distinct-score table, not rows: the classifier_auc
    contract (``score_round`` caps raw continuous domains; model
    scores are normally already quantized).

    Scale shape: one score-grain aggregation with map-side combine,
    then a single-group applyInPandas over the bounded distinct-score
    table. No SQL oracle exists for the fixpoint (rows-only gate);
    the pytest pins PAV against an independent reference and the
    monotonicity/pool-mean invariants."""
    if score_round is not None and score_round < 0:
        raise ValueError(
            f"isotonic_fit: score_round must be >= 0, got {score_round}"
        )
    s_in = F.col(score_col).cast("double")
    if score_round is not None:
        s_in = F.round(s_in, score_round)
    per = (
        df.select(
            s_in.alias("score"),
            F.col(label_col).cast("boolean").cast("long").alias("_y"),
        )
        .where(F.col("score").isNotNull() & F.col("_y").isNotNull())
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("pos"),
        )
    )

    import pandas as pd

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("score").reset_index(drop=True)
        # pools: [start_idx, weight, pos_sum]
        pools: list[list[int]] = []
        for i in range(len(pdf)):
            pools.append([i, int(pdf["n"][i]), int(pdf["pos"][i])])
            # merge while the previous pool's rate exceeds the new one
            while (
                len(pools) > 1
                and pools[-2][2] * pools[-1][1] >= pools[-1][2] * pools[-2][1]
            ):
                _, w, p = pools.pop()
                pools[-1][1] += w
                pools[-1][2] += p
        rates = [0.0] * len(pdf)
        for k, (start, w, p) in enumerate(pools):
            end = pools[k + 1][0] if k + 1 < len(pools) else len(pdf)
            r = p / w
            for i in range(start, end):
                rates[i] = r
        out = pdf[["score", "n", "pos"]].copy()
        out["iso_rate"] = rates
        return out

    return per.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda key, pdf: pav(pdf),
        schema="score double, n long, pos long, iso_rate double",
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str,
) -> DataFrame:
    """Weight of Evidence + Information Value of a categorical feature
    against a binary label (the credit-scoring standard — Siddiqi,
    "Credit Risk Scorecards" 2006, public convention): per category,
    ``WOE = ln((gᵢ/G)/(bᵢ/B))``; the feature's ``IV = Σ (gᵢ/G −
    bᵢ/B)·WOEᵢ`` (< 0.02 useless, 0.1–0.3 medium, > 0.5 suspicious —
    the published gates). The feature-SELECTION companion to
    :func:`target_encode`'s feature construction and the leakage
    screen next to mutual_information (IV explodes on leaked
    columns). Add-0.5 cell smoothing (documented — keeps one-sided
    categories finite), with totals adjusted by k/2 so the smoothed
    shares still sum to 1.

    Exactness: the smoothed WOE argument collapses to ALL-INTEGER
    counts — ``ln((2gᵢ+1)·(2B+k) / ((2bᵢ+1)·(2G+k)))`` — micro-
    quantized to int64; each IV term is ONE engine-identical IEEE
    chain over exact integers, micro-quantized (1e-9 units) BEFORE
    the cross-category sum, so the fold is aggregation-order-proof.

    Output: one row per category ``(category (string), n_pos, n_neg
    (long), woe (double))`` plus the global readout repeated:
    ``iv (double), n_categories (long)``.

    Scale shape: one category-grain aggregation, one 1-row totals
    attach, one k-row fold — the target_encode shape."""
    c = F.col(cat_col).cast("string")
    y = F.col(label_col).cast("boolean")
    per = (
        df.select(c.alias("_c"), y.alias("_y"))
        .where(F.col("_c").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_c")
        .agg(
            F.sum(F.col("_y").cast("long")).alias("n_pos"),
            F.sum((~F.col("_y")).cast("long")).alias("n_neg"),
        )
    )
    tot = per.agg(
        F.coalesce(F.sum("n_pos"), F.lit(0)).cast("long").alias("_g"),
        F.coalesce(F.sum("n_neg"), F.lit(0)).cast("long").alias("_b"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
    )
    staged = per.crossJoin(F.broadcast(tot))
    num = (F.lit(2) * F.col("n_pos") + 1).cast("double") * (
        F.lit(2) * F.col("_b") + F.col("n_categories")
    ).cast("double")
    den = (F.lit(2) * F.col("n_neg") + 1).cast("double") * (
        F.lit(2) * F.col("_g") + F.col("n_categories")
    ).cast("double")
    woe = F.log(num / den)
    share_diff = (F.lit(2) * F.col("n_pos") + 1).cast("double") / (
        F.lit(2) * F.col("_g") + F.col("n_categories")
    ).cast("double") - (F.lit(2) * F.col("n_neg") + 1).cast("double") / (
        F.lit(2) * F.col("_b") + F.col("n_categories")
    ).cast("double")
    term_nano = F.round(share_diff * woe * F.lit(1e9)).cast("long")
    scored = staged.select(
        F.col("_c").alias("category"),
        "n_pos",
        "n_neg",
        F.round(woe, 9).alias("woe"),
        term_nano.alias("_tn"),
        "n_categories",
    )
    iv = scored.agg(
        F.coalesce(F.sum("_tn"), F.lit(0)).cast("long").alias("_ivn")
    )
    return scored.crossJoin(F.broadcast(iv)).select(
        "category",
        "n_pos",
        "n_neg",
        "woe",
        F.round(F.col("_ivn").cast("double") / F.lit(1e9), 9).alias("iv"),
        "n_categories",
    )


def group_rare_categories(
    df: DataFrame,
    cat_col: str,
    min_count: int = 10,
    other_token: str = "__other__",
    out_col: str | None = None,
) -> DataFrame:
    """Bucket rare categorical values into one ``other_token`` label —
    the standard cardinality clamp before :func:`target_encode` /
    one-hot construction (rare levels carry no trainable signal and
    explode encoder state; sklearn's ``min_frequency`` convention).
    NULL stays NULL (missingness is its own signal, not rarity).
    Appends ``out_col`` (default ``{cat_col}_grouped``); all other
    columns pass through.

    Scale shape: one category-grain count, one equi-join back (AQE
    broadcasts the category table while it fits — it is
    vocabulary-sized, never row-sized)."""
    if min_count < 1:
        raise ValueError(
            f"group_rare_categories: min_count must be >= 1, got {min_count}"
        )
    out_col = out_col or f"{cat_col}_grouped"
    if out_col in df.columns:
        raise ValueError(
            f"group_rare_categories: output column {out_col!r} already exists"
        )
    keep = (
        df.select(F.col(cat_col).cast("string").alias("_k"))
        .where(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("_k", F.lit(True).alias("_keep"))
    )
    return (
        df.join(
            keep, F.col(cat_col).cast("string") == F.col("_k"), "left"
        )
        .withColumn(
            out_col,
            F.when(F.col(cat_col).isNull(), F.lit(None).cast("string"))
            .when(F.col("_keep"), F.col(cat_col).cast("string"))
            .otherwise(F.lit(other_token)),
        )
        .drop("_k", "_keep")
    )


def rfm_segmentation(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    amount_col: str,
    n_bins: int = 5,
    unit_scale: int = 100,
) -> DataFrame:
    """RFM segmentation (Hughes, "Strategic Database Marketing" 1994 —
    the classic recency/frequency/monetary quintile coding): each unit
    gets three 1..n_bins codes, n_bins = best (most recent, most
    frequent, highest spend), concatenated into the familiar segment
    string ("555" = champions). The standard first segmentation of any
    behavioral log, and the canonical input to the engine's
    target_encode / cluster samplers. One row per unit: ``(user,
    recency_days, frequency (long), monetary (double), r, f, m
    (long), rfm (string))``.

    Determinism: recency anchors on the corpus max timestamp (a 1-row
    broadcast); monetary quantizes to integers; each dimension's bin
    boundaries are ONE exact R-7 array-percentile over the UNIT-grain
    table, binned by the ties-low ``1 + Σ(x > bᵢ)`` fold (the PSI
    convention — tie-heavy frequencies land deterministically);
    recency's code is inverted (n_bins + 1 − bin) so that smaller =
    more recent = higher code, stated identically in the oracle.

    Scale shape: one user-grain aggregation, one 1-row anchor attach,
    three percentile scalars broadcast back — no windows, nothing
    row-grain past the first groupBy."""
    if n_bins < 2:
        raise ValueError(f"rfm_segmentation: n_bins must be >= 2, got {n_bins}")
    per = (
        df.where(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(amount_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.max(F.col(ts_col)).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(
                F.round(F.col(amount_col).cast("double") * F.lit(unit_scale))
                .cast("long")
            )
            .cast("long")
            .alias("_mq"),
        )
    )
    anchor = df.agg(F.max(F.col(ts_col)).alias("_wend"))
    staged = per.crossJoin(F.broadcast(anchor)).select(
        "user",
        F.datediff("_wend", "_last").cast("long").alias("recency_days"),
        "frequency",
        "_mq",
    )
    fracs = ", ".join(repr(i / n_bins) for i in range(1, n_bins))
    bounds = staged.agg(
        F.expr(f"percentile(recency_days, array({fracs}))").alias("_br"),
        F.expr(f"percentile(frequency, array({fracs}))").alias("_bf"),
        F.expr(f"percentile(_mq, array({fracs}))").alias("_bm"),
    )

    def code(col: str, barr: str):
        return (
            F.lit(1)
            + F.aggregate(
                barr,
                F.lit(0),
                lambda acc, b: acc + (F.col(col) > b).cast("int"),
            )
        ).cast("long")

    return staged.crossJoin(F.broadcast(bounds)).select(
        "user",
        "recency_days",
        "frequency",
        (F.col("_mq").cast("double") / F.lit(float(unit_scale))).alias(
            "monetary"
        ),
        (F.lit(n_bins + 1) - code("recency_days", "_br")).alias("r"),
        code("frequency", "_bf").alias("f"),
        code("_mq", "_bm").alias("m"),
        F.concat(
            (F.lit(n_bins + 1) - code("recency_days", "_br")).cast("string"),
            code("frequency", "_bf").cast("string"),
            code("_mq", "_bm").cast("string"),
        ).alias("rfm"),
    )


def kfold_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    k: int = 5,
    smoothing: int = 10,
    unit_scale: int = 100,
) -> DataFrame:
    """LEAKAGE-SAFE k-fold target encoding (the out-of-fold variant of
    :func:`target_encode`, per Micci-Barreca 2001 §4 as popularized by
    every gradient-boosting pipeline): each row's category encoding is
    computed from the OTHER k−1 folds only — both the category sums
    AND the global prior — so the feature a model trains on never
    contains its own row's label. Folds are assigned by the
    deterministic md5 hash of ``id_col`` (``sampling.hash_uniform`` —
    engine-portable, cluster-size-independent, restated in the
    oracle), so the same row lands in the same fold everywhere. One
    row per (category, fold): ``(category (string), fold (long),
    n_oof (long — out-of-fold category count), enc (double; NULL when
    the out-of-fold slice is empty))`` — join back on (category,
    fold(id)) to attach.

    Exactness: the target_encode integer identity per fold — with
    N', T' the out-of-fold global count/sum and n', s' the
    out-of-fold category count/sum, ``enc = (N'·s' + m·T') /
    (N'·(n' + m)·unit_scale)`` — all DECIMAL(38,0)/HUGEINT, ONE IEEE
    division. Scale shape: one (category, fold)-grain aggregation,
    one k-row fold-total broadcast; no windows, no row-grain join."""
    from .sampling import hash_uniform

    if k < 2:
        raise ValueError(f"kfold_target_encode: k must be >= 2, got {k}")
    if smoothing < 0:
        raise ValueError("kfold_target_encode: smoothing must be >= 0")
    fold = F.floor(hash_uniform(F.col(id_col)) * F.lit(k)).cast("long")
    base = df.select(
        F.col(cat_col).cast("string").alias("_cat"),
        fold.alias("fold"),
        F.round(F.col(target_col).cast("double") * F.lit(unit_scale))
        .cast("long")
        .alias("_y"),
    ).where(
        F.col("_cat").isNotNull()
        & F.col("_y").isNotNull()
        & F.col("fold").isNotNull()
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = base.groupBy("_cat", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("_nf"),
        F.sum("_y").cast("decimal(38,0)").alias("_sf"),
    )
    cat_tot = per.groupBy("_cat").agg(
        F.sum("_nf").cast("long").alias("_nc"),
        F.sum("_sf").cast("decimal(38,0)").alias("_sc"),
    )
    fold_tot = per.groupBy("fold").agg(
        F.sum("_nf").cast("long").alias("_ng"),
        F.sum("_sf").cast("decimal(38,0)").alias("_sg"),
    )
    glob = per.agg(
        F.sum("_nf").cast("long").alias("_nn"),
        F.sum("_sf").cast("decimal(38,0)").alias("_tt"),
    )
    staged = (
        per.join(cat_tot, "_cat")
        .join(F.broadcast(fold_tot), "fold")
        .crossJoin(F.broadcast(glob))
    )
    n_oof = (F.col("_nc") - F.col("_nf")).cast("long")
    s_oof = (F.col("_sc") - F.col("_sf")).cast("decimal(38,0)")
    ng_oof = (F.col("_nn") - F.col("_ng")).cast("decimal(38,0)")
    tg_oof = (F.col("_tt") - F.col("_sg")).cast("decimal(38,0)")
    m = F.lit(smoothing).cast("decimal(38,0)")
    num = ng_oof * s_oof + m * tg_oof
    den = ng_oof * (n_oof.cast("decimal(38,0)") + m) * F.lit(unit_scale).cast(
        "decimal(38,0)"
    )
    return staged.select(
        F.col("_cat").alias("category"),
        "fold",
        n_oof.alias("n_oof"),
        F.when(
            ng_oof > 0, num.cast("double") / den.cast("double")
        ).alias("enc"),
    )


def scale_features(
    df: DataFrame,
    id_col: str,
    value_col: str,
    unit_scale: int = 100,
) -> DataFrame:
    """The three standard feature scalers in one pass — min-max to
    [0, 1], z-score (sample σ), and robust (median/IQR, the
    outlier-proof default) — the last preprocessing mile before any
    distance-based model or regularized regression, where raw dollar
    and count columns would otherwise dominate the geometry. One row
    per input row: ``(id, value (double — the quantized input),
    minmax, zscore, robust (double; NULL where the respective spread
    is 0))``.

    Exactness: values quantize at ``unit_scale``; min/max/Σ/Σ² are
    exact-integer aggregates and median/IQR the pinned-R-7 percentiles
    of integers (exact at worst x.5 in doubles); each scaled output is
    ONE engine-identical IEEE chain, rounded to 9. Scale shape: one
    1-row global-stats aggregate broadcast onto the stream — no
    window, no sort, no row-grain join."""
    v = F.round(F.col(value_col).cast("double") * F.lit(unit_scale)).cast("long")
    base = df.select(F.col(id_col).alias("id"), v.alias("_v")).where(
        F.col("id").isNotNull() & F.col("_v").isNotNull()
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("_v").alias("_mn"),
        F.max("_v").alias("_mx"),
        F.coalesce(F.sum(dec("_v")), F.lit(0).cast("decimal(38,0)")).alias("_s"),
        F.coalesce(
            F.sum((dec("_v") * dec("_v")).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_q"),
        F.expr("percentile(_v, 0.25)").alias("_q1"),
        F.expr("percentile(_v, 0.5)").alias("_med"),
        F.expr("percentile(_v, 0.75)").alias("_q3"),
    )
    staged = base.crossJoin(F.broadcast(stats))
    n = F.col("_n").cast("double")
    vv = F.col("_v").cast("double")
    mean = F.col("_s").cast("double") / n
    var = (F.col("_q").cast("double") - F.col("_s").cast("double") * F.col("_s").cast("double") / n) / (
        n - F.lit(1.0)
    )
    iqr = F.col("_q3") - F.col("_q1")
    rng = (F.col("_mx") - F.col("_mn")).cast("double")
    return staged.select(
        "id",
        F.round(vv / F.lit(float(unit_scale)), 9).alias("value"),
        F.when(rng > 0, F.round((vv - F.col("_mn").cast("double")) / rng, 9)).alias("minmax"),
        F.when(
            (F.col("_n") >= 2) & (var > 0),
            F.round((vv - mean) / F.sqrt(var), 9),
        ).alias("zscore"),
        F.when(iqr > 0, F.round((vv - F.col("_med")) / iqr, 9)).alias("robust"),
    )
