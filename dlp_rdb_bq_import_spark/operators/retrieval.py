"""Hybrid-retrieval rank fusion.

A RAG/data-curation pipeline retrieves candidates from heterogeneous
retrievers — lexical (BM25 over text) and dense (ANN over embeddings)
— and must merge the ranked lists into one. Reciprocal-rank fusion
(Cormack, Clarke & Buettcher, SIGIR 2009 — public algorithm) is the
standard score-free merge: fused(d) = Σ_lists 1/(k + rank_d), robust
to incomparable score scales because only ranks enter.

The reference has no retrieval surface at all (its unit of work is an
RDB row batch — common/TableToDbRowFn.java); this module EXTENDS the
engine the direction a training-data/RAG pipeline needs, composing
with text.bm25_topk and similarity.brute_force_topk/lsh/ivf/pq.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse ranked candidate lists by reciprocal rank.

    Each input carries ``(id_col, rank_col)`` (1-based ranks, lower =
    better — exactly the shape bm25_topk and the ANN operators emit).
    A document present in ANY list is scored (full-outer joins);
    absence from a list contributes 0. Each list is expected to rank a
    document at most once (every upstream retriever emits unique ids);
    the precondition is ENFORCED here — a duplicate id within one list
    collapses to its best (minimum) rank before fusion, because an
    un-collapsed duplicate would fan out through the full-outer join
    chain and double-count its reciprocal-rank contribution. Output:
    ``(id_col, rrf_score, rk)`` ordered by score desc / id asc.

    Bit-exactness: the fused sum adds one correctly-rounded division
    per list in FIXED list order (never a shuffle-ordered float
    aggregation), so results hash-match a SQL oracle stating the same
    expression; ``rrf_score`` rounds to 9 decimals like the BM25
    scores it composes with.

    Scale shape: inputs are top-k results — bounded, broadcast-sized —
    so the full-outer joins and the single ordering window run on
    candidate lists, never corpora. The heavy lifting (corpus scans)
    already happened inside the upstream retrievers; fusion is a
    driver-light merge of their outputs. The global row_number window
    is deliberate: the fused set is ≤ Σ k_i rows by construction.
    """
    if not rankings:
        raise ValueError("rankings must be a non-empty list of ranked DataFrames")
    for i, r in enumerate(rankings):
        if id_col not in r.columns or rank_col not in r.columns:
            raise ValueError(
                f"rankings[{i}] must carry ({id_col!r}, {rank_col!r}); "
                f"got {r.columns}"
            )
    joined: DataFrame | None = None
    for i, r in enumerate(rankings):
        ri = (
            r.select(F.col(id_col), F.col(rank_col).alias(f"_rk{i}"))
            .groupBy(id_col)
            .agg(F.min(f"_rk{i}").alias(f"_rk{i}"))
        )
        joined = ri if joined is None else joined.join(ri, id_col, "full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"_rk{i}").cast("double")),
            F.lit(0.0),
        )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    out = (
        joined.select(F.col(id_col), F.round(score, 9).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    )
    if top_n is not None:
        out = out.limit(top_n)
    return out.withColumn("rk", F.row_number().over(w).cast("long"))


def ndcg_at_k(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    gain_col: str = "gain",
) -> DataFrame:
    """nDCG@k per query (Järvelin & Kekäläinen, TOIS 2002 — the
    standard graded-relevance retrieval metric; the ranking-quality
    eval for the BM25/QL/RRF family the way classifier_auc is for
    scorers): ``DCG@k = Σ_{r≤k} gain_r / log2(r+1)`` over the run's
    ranking, normalized by the ideal DCG of the query's own qrels
    (top-k gains in descending order).

    Exactness discipline: ranks are bounded by k, so each rank's
    ``1/log2(r+1)`` discount is a precomputed double literal; every
    term quantizes to int64 micro-units (``round(gain·disc·1e6)``)
    BEFORE the per-query integer sum — aggregation-order-proof and
    restatable (the bigram-LM/PMI micro-log discipline). The ideal
    ranking orders by (gain DESC, doc ASC): total, so IDCG is
    deterministic under gain ties in any engine.

    Output: one row per query appearing in the run —
    ``query_col, dcg_micro, idcg_micro (long), ndcg (double rounded
    to 9; NULL when the query has no positive qrels — undefined, not
    0)``. Unjudged run docs contribute gain 0 (the standard
    convention). Shape: a k-bounded run join against the qrels table
    plus a per-query top-k of qrels (window over judged docs only) —
    everything at (query, doc) grain, never corpus grain."""
    if k < 1:
        raise ValueError(f"ndcg_at_k: k must be >= 1, got {k}")
    discounts = {r: 1.0 / __import__("math").log2(r + 1) for r in range(1, k + 1)}
    disc = None
    for r, d in discounts.items():
        branch = (F.col("_r") == r, F.lit(d))
        disc = F.when(*branch) if disc is None else disc.when(*branch)
    topk = run.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("int").alias("_r"),
    ).where(F.col("_r") <= k)
    judged = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(gain_col).cast("long").alias("_g"),
    )
    dcg = (
        topk.join(judged, ["_q", "_d"], "left")
        .select(
            "_q",
            F.round(
                F.coalesce(F.col("_g"), F.lit(0)).cast("double")
                * disc
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("_t"),
        )
        .groupBy("_q")
        .agg(F.sum("_t").cast("long").alias("dcg_micro"))
    )
    w = Window.partitionBy("_q").orderBy(F.col("_g").desc(), F.col("_d").asc())
    ideal = (
        judged.where(F.col("_g") > 0)
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select(
            "_q",
            F.round(F.col("_g").cast("double") * disc * F.lit(1000000.0))
            .cast("long")
            .alias("_t"),
        )
        .groupBy("_q")
        .agg(F.sum("_t").cast("long").alias("idcg_micro"))
    )
    return (
        dcg.join(ideal, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            "dcg_micro",
            F.coalesce("idcg_micro", F.lit(0)).cast("long").alias("idcg_micro"),
            F.when(
                F.coalesce(F.col("idcg_micro"), F.lit(0)) > 0,
                F.round(
                    F.col("dcg_micro").cast("double")
                    / F.col("idcg_micro").cast("double"),
                    9,
                ),
            ).alias("ndcg"),
        )
    )


def rank_eval_at_k(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    gain_col: str = "gain",
) -> DataFrame:
    """MRR@k and MAP@k over a run (Voorhees, TREC-8 1999 for MRR;
    the trec_eval AP@k convention — AP normalized by min(R, k)): the
    BINARY-relevance companions to :func:`ndcg_at_k` — MRR prices the
    FIRST hit (navigational queries), MAP the whole ranked precision
    profile. Relevance is ``gain > 0``. Queries are the qrels' queries
    with ≥ 1 relevant doc (the trec_eval universe); a query whose
    relevant docs the run misses contributes 0 to both means. One row
    out: ``(n_queries (long), mrr, map_at_k (double; NULL when no
    query has relevant docs))``.

    Exactness: with L = lcm(1..k), every precision term at a relevant
    rank is the exact integer ``hits·(L/rank)``, so the per-query AP
    fold is an integer sum — order-proof — and the single AP/RR
    divisions micro-quantize to nano-units before the cross-query
    mean (the ndcg_at_k discipline exactly). Scale shape: run and
    qrels are top-k/judgment-sized; one per-query window over ≤ k
    rows, two query-grain aggregates."""
    import math

    if k < 1:
        raise ValueError(f"rank_eval_at_k: k must be >= 1, got {k}")
    L = math.lcm(*range(1, k + 1))
    rel = qrels.where(F.col(gain_col) > 0).select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
    )
    rq = rel.groupBy("_q").agg(F.count(F.lit(1)).cast("long").alias("_r"))
    top = run.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("long").alias("_rnk"),
    )
    j = top.join(rel.withColumn("_isrel", F.lit(1)), ["_q", "_d"], "left").select(
        "_q", "_rnk", F.coalesce("_isrel", F.lit(0)).alias("_isrel")
    )
    w = Window.partitionBy("_q").orderBy(F.col("_rnk").asc())
    h = j.select("_q", "_rnk", "_isrel", F.sum("_isrel").over(w).alias("_hits"))
    per = h.groupBy("_q").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_isrel") == 1,
                    (
                        F.col("_hits")
                        * (F.lit(float(L)) / F.col("_rnk").cast("double")).cast("long")
                    ).cast("long"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_terms"),
        F.min(F.when(F.col("_isrel") == 1, F.col("_rnk"))).alias("_fr"),
    )
    scored = rq.join(per, "_q", "left").select(
        "_q",
        F.round(
            F.coalesce(F.lit(1e9) / F.col("_fr").cast("double"), F.lit(0.0))
        )
        .cast("long")
        .alias("_rr_nano"),
        F.round(
            F.coalesce(F.col("_terms"), F.lit(0)).cast("double")
            / (F.lit(float(L)) * F.least(F.col("_r"), F.lit(k)).cast("double"))
            * F.lit(1e9)
        )
        .cast("long")
        .alias("_ap_nano"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum("_rr_nano").cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1)).cast("double"),
                9,
            ),
        ).alias("mrr"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum("_ap_nano").cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1)).cast("double"),
                9,
            ),
        ).alias("map_at_k"),
    )
