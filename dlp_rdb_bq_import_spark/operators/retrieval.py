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
