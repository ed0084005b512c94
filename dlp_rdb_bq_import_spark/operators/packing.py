"""Sequence packing: assign documents to fixed-token-budget training
sequences.

GPT-style pretraining concatenates documents per source stream in a
deterministic order and cuts the stream every ``budget`` tokens; the
pack assignment (which sequence a document starts in, at which offset)
is pure integer arithmetic over a running token total. That makes it a
window-function one-liner — one shuffle on the stream key, no Python —
and bit-identical across engines, so the DuckDB oracle can state the
same expression.

100 TB posture: the only shuffle is the window partition on
``stream_col`` (source), and each partition's running sum is a single
ordered pass. Skewed sources are the caller's knob — pack per (source,
shard) if one source dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_col: Column | str,
    budget: int,
    stream_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Adds ``n_tokens``, ``seq_id`` (which budget-sized sequence this
    document STARTS in, per stream) and ``seq_offset`` (token offset of
    the document inside that sequence). Documents longer than the
    budget simply span sequences — exactly what a contiguous-stream
    loader does."""
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("n_tokens", tokens.cast("long"))
        .withColumn("seq_id", F.floor(before / budget).cast("long"))
        .withColumn("seq_offset", (before % budget).cast("long"))
    )
