"""LLM-data-pipeline operators: dedup, similarity, text analysis, multimodal."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Widen a DataFrame to the session's parallelism IF it is narrower.

    CPU-heavy per-document stages (stride-1 gram explodes, Arrow-batched
    numpy kernels) inherit the scan's partitioning, which is sized for
    the RAW bytes — a 1 MB parquet split that explodes into GBs of work
    runs on one core. At fixture scale that starves a 32-core session;
    the conditional matters for the 100 TB posture: a corpus with more
    input splits than cores passes through untouched, so this never
    inserts a full-corpus shuffle where the scan is already wide."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
