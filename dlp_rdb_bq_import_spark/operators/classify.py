"""Multinomial Naive Bayes text classification — the trainable
quality/domain/language classifier stage of a training-data pipeline
(the SQL-expressible cousin of the fastText linear classifiers CCNet /
RefinedWeb-style pipelines apply at corpus scale; the algorithm is the
public multinomial NB of McCallum & Nigam 1998).

Reference seam: the reference delegates every content-classification
decision to the DLP service (`common/DLPTokenizationDoFn.java:93-97`
ships values out for inspection); this module is the corresponding
IN-ENGINE classifier for corpus curation, with the same persistable-
artifact discipline as the bigram LM (`operators/text.py`).

Model artifact: ONE persistable table ``(label, token, c)``.
- token != ''  → count of occurrences of ``token`` in training docs
  of ``label`` (the multinomial event counts);
- token  = ''  → the label's DOCUMENT count (the prior numerator).
  The tokenizer (space-split, empty-filtered) can never emit an empty
  token, so the reserved row is collision-free.
Label stats (per-label token mass ``C_l``), the vocabulary size ``V``
and the priors all DERIVE from this one table at scoring time, so the
artifact round-trips through the warehouse sink and maintains by
count-addition exactly like the LM / MinHash / bench-gram indexes
(``merge_nb_model``: merge(train(A), train(B)) ≡ train(A ∪ B)).

Bit-exactness (the repo-wide micro-log scheme): with add-k smoothing,

  score(d, l) = ln P(l) + Σ_t ln P(t|l)
              = ln(docs_l/docs) + Σ_hits ln(c_tl + k)
                + (n_tok − n_hits_l)·ln(k) − n_tok·ln(C_l + k·V)

Each ln(·) input is an identical double on any engine (exact integers,
plus k halves and one correctly-rounded division for the prior); each
term quantizes to integer MICRO-LOGS (round(ln(x)·1e6) as int64)
BEFORE any aggregation, so per-(doc,label) scores are exact integer
sums — aggregation-order-independent, hash-matchable vs a SQL oracle.

Scale shape: the corpus side is the exploded token stream; the only
corpus-sized join is (token) vs the MODEL token table (model-sized —
broadcast territory after ``min_count`` pruning) with fan-out bounded
by the number of labels containing the token; label stats attach as a
broadcast #labels-row table; one groupBy per (doc, label) and one
per-doc top-1 window on scalars end the plan. Nothing is ever
|docs| × |vocabulary|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _doc_tokens(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """One row per token OCCURRENCE (multinomial counts need
    multiplicity): space-split, empty tokens dropped — the same
    tokenizer as the bigram LM, so the two quality models see the
    same token stream."""
    cols = [F.col(id_col)] if id_col else []
    return df.select(
        *cols,
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ).alias("token"),
    )


def nb_train(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Train the model: one groupBy over the exploded (label, token)
    stream plus one per-label doc count — the whole artifact.

    ``min_count`` prunes rare (label, token) rows (pruned tokens fall
    back to the smoothed unseen path at scoring time, and the derived
    ``C_l`` mass stays consistent because it is re-derived from the
    PRUNED table). Doc-count sentinel rows are never pruned. Docs with
    zero tokens still count toward the prior (they carry label
    evidence even without content)."""
    toks = (
        _doc_tokens(df.select(F.col(label_col).alias("label"), text_col), text_col, "label")
        .groupBy("label", "token")
        .agg(F.count("*").alias("c"))
    )
    if min_count > 1:
        toks = toks.where(F.col("c") >= min_count)
    docs = (
        df.select(F.col(label_col).alias("label"))
        .groupBy("label")
        .agg(F.count("*").alias("c"))
        .select("label", F.lit("").alias("token"), "c")
    )
    return toks.unionByName(docs)


def merge_nb_model(model: DataFrame, new_counts: DataFrame) -> DataFrame:
    """Fold a new batch's counts into a persisted model — steady-state
    maintenance: union + one groupBy sum over BOTH row kinds (token
    counts and doc-count sentinels add the same way), so
    ``merge(train(A), train(B)) ≡ train(A ∪ B)`` exactly
    (pytest-pinned). Merge UNPRUNED models and prune only the merged
    result — pruning first loses mass a later batch could restore."""
    for side, d in (("model", model), ("new_counts", new_counts)):
        if not {"label", "token", "c"} <= set(d.columns):
            raise ValueError(
                f"{side} must be an nb_train result with (label, token, c); "
                f"got {d.columns}"
            )
    return (
        model.select("label", "token", "c")
        .unionByName(new_counts.select("label", "token", "c"))
        .groupBy("label", "token")
        .agg(F.sum("c").alias("c"))
    )


def _label_stats(model: DataFrame, add_k: float) -> DataFrame:
    """Per-label scalars derived from the model table: doc count,
    token mass, the two per-label micro-log constants. The vocabulary
    size V (a global scalar) attaches as a broadcast 1-row aggregate
    first. #labels rows total."""
    tok = model.where(F.col("token") != "")
    v = tok.agg(F.count_distinct("token").alias("v"))
    per_label = (
        tok.groupBy("label")
        .agg(F.sum("c").cast("long").alias("cl"))
        .join(
            model.where(F.col("token") == "").select(
                "label", F.col("c").cast("long").alias("docs_l")
            ),
            "label",
            "full",
        )
        .select(
            "label",
            F.coalesce(F.col("cl"), F.lit(0)).alias("cl"),
            F.coalesce(F.col("docs_l"), F.lit(0)).alias("docs_l"),
        )
    )
    total = per_label.agg(F.sum("docs_l").cast("long").alias("docs"))
    return (
        per_label.crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            F.round(
                F.log(
                    F.col("cl").cast("double")
                    + F.lit(add_k) * F.col("v").cast("double")
                )
                * MICRO
            )
            .cast("long")
            .alias("lp_denom"),
            F.round(
                F.log(F.col("docs_l").cast("double") / F.col("docs").cast("double"))
                * MICRO
            )
            .cast("long")
            .alias("lp_prior"),
        )
    )


def nb_scores(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Score every (doc, label) pair under the trained model. Output
    ``(id_col, label, n_tokens, score_micro)`` — score_micro the exact
    int64 micro-log joint log-probability (up to the shared evidence
    constant), comparable across labels of the same doc.

    Docs with zero tokens carry no multinomial evidence and are
    omitted (the tokenizer's explode drops them; document contract).

    Unseen tokens (absent from the model for a label — or entirely)
    contribute the uniform floor ln(k) − ln(C_l + k·V) via the closed
    form, so NEW batches score cleanly — the incremental contract."""
    if not {"label", "token", "c"} <= set(model.columns):
        raise ValueError(
            f"model must be an nb_train result with (label, token, c); got {model.columns}"
        )
    toks = _doc_tokens(df, text_col, id_col)
    lp_unseen = F.round(F.log(F.lit(add_k)) * MICRO).cast("long")
    hits = (
        toks.join(
            model.where(F.col("token") != "").select(
                "token",
                "label",
                F.round(F.log(F.col("c").cast("double") + F.lit(add_k)) * MICRO)
                .cast("long")
                .alias("_lp"),
            ),
            "token",
        )
        .groupBy(id_col, "label")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.sum("_lp").alias("lp_hits"),
        )
    )
    ntok = toks.groupBy(id_col).agg(F.count("*").cast("long").alias("n_tokens"))
    stats = _label_stats(model, add_k)
    return (
        ntok.crossJoin(F.broadcast(stats))
        .join(hits, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "label",
            "n_tokens",
            (
                F.coalesce(F.col("lp_hits"), F.lit(0))
                + (F.col("n_tokens") - F.coalesce(F.col("n_hits"), F.lit(0)))
                * lp_unseen
                - F.col("n_tokens") * F.col("lp_denom")
                + F.col("lp_prior")
            )
            .cast("long")
            .alias("score_micro"),
        )
    )


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Argmax label per document (ties break by label ascending, so
    the pick is deterministic on any engine). The window runs over
    #labels scalar rows per doc — never text. Output
    ``(id_col, label, n_tokens, score_micro)``."""
    scored = nb_scores(df, model, text_col, id_col, add_k)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(id_col, "label", "n_tokens", "score_micro")
    )
