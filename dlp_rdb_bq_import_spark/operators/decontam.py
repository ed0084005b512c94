"""Benchmark decontamination: find training documents that overlap an
evaluation/benchmark set by shared word n-grams.

The step every LLM training pipeline runs before a corpus ships:
n-gram collisions between train and eval inflate benchmark scores, so
contaminated documents must be flagged (and usually dropped). The
classic recipe (GPT-3 appendix C / PaLM / Llama reports) is exact
n-gram overlap: a training doc is contaminated if it shares >= k
distinct n-grams with any benchmark doc.

100 TB design: the benchmark side is always tiny (thousands of docs,
millions of n-grams) while the training side is the 100 TB corpus —
so the benchmark n-gram set is BROADCAST and the training side is
never shuffled: shingle (narrow), map-side broadcast semi/inner join,
then a partial-aggregated count per (train_doc, bench_doc). N-grams
travel as xxhash64 values (fixed 8 bytes) rather than strings.
Contrast the reference, which has no corpus-level operators at all —
its unit of work is one RDB row batch (`TableToDbRowFn.java:80-174`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hashed_shingles


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    min_hits: int = 3,
    unit: str = "word",
    broadcast_bench: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """(train_id, bench_id, overlap_ngrams) for every train/bench pair
    sharing >= ``min_hits`` distinct word n-grams.

    Both sides shingle with the same ``hashed_shingles`` used by the
    near-dup family; the overlap count is over *distinct shared
    n-grams*. Order of operations is the scale-critical part: the
    training side joins the broadcast benchmark set RAW (no per-doc
    dedup first — that would shuffle the full corpus's shingle
    stream), and the distinct runs on the join survivors, which are
    only the contaminated slivers. The training corpus is therefore
    never shuffled at full width; the one real exchange carries
    matches only.
    """
    tr = hashed_shingles(
        train, text_col, id_col, n=n, num_partitions=num_partitions, unit=unit,
        distinct=False,
    ).withColumnRenamed(id_col, "train_id")
    be = hashed_shingles(bench, text_col, id_col, n=n, unit=unit).withColumnRenamed(
        id_col, "bench_id"
    )
    if broadcast_bench:
        be = F.broadcast(be)
    return (
        tr.join(be, "_h")
        .select("train_id", "bench_id", "_h")
        .distinct()
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("overlap_ngrams"))
        .where(F.col("overlap_ngrams") >= min_hits)
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    min_hits: int = 3,
    unit: str = "word",
    num_partitions: int | None = None,
) -> DataFrame:
    """Training corpus with contaminated documents removed (left-anti
    join against the flagged set — one broadcast-driven pass)."""
    flagged = (
        contamination_pairs(
            train,
            bench,
            text_col,
            id_col,
            n=n,
            min_hits=min_hits,
            unit=unit,
            num_partitions=num_partitions,
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(flagged, id_col, "left_anti")
