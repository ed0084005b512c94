"""Sequence packing: assign documents to fixed-token-budget training
sequences.

Two packing models, matching the two ways trainers consume documents:

- :func:`pack_sequences` — CONTIGUOUS streams: documents concatenate
  per source in a deterministic order and the stream is cut every
  ``budget`` tokens; documents span cuts, so there is no padding at
  all. Pure window arithmetic, bit-identical across engines.
- :func:`bin_pack_sequences` — WHOLE-DOCUMENT bins: each document
  must land inside ONE sequence (no splitting — the regime used when
  cross-document attention contamination or truncation is
  unacceptable), so the tail of every bin is padding and the job is
  to MINIMIZE it. Best-fit-decreasing (the classic public heuristic,
  11/9-OPT — Johnson 1973) per hash shard.

100 TB posture: pack_sequences' only shuffle is the window partition
on ``stream_col``; bin_pack_sequences' is one hash-shard exchange, and
the greedy runs per shard over Arrow batches (the greedy is inherently
sequential — sharding is what makes it distributed, at the cost of
never packing across shards; waste stays near-optimal because every
shard sees the full size distribution). Skewed sources are the
caller's knob — pack per (source, shard) if one source dominates.
"""

from __future__ import annotations

import bisect

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


def bin_pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Padding-minimizing WHOLE-DOCUMENT packing: assign each document
    to exactly one fixed-capacity sequence (bin) via
    best-fit-decreasing — sort by length descending, place each
    document in the fullest bin it still fits (public heuristic,
    guaranteed within 11/9 of optimal bin count; Johnson 1973). The
    contiguous :func:`pack_sequences` wastes nothing but splits
    documents; this never splits and minimizes the per-bin padding
    tail instead — the trade production packers make when documents
    must not share a truncation boundary.

    Output: one row per input document —
    ``(key_col, n_tokens, shard, bin_id)`` with ``bin_id`` globally
    unique (``shard * 2^40 + shard-local bin``). A document LONGER
    than the budget gets a bin of its own (splitting/truncation is the
    loader's decision, flagged by ``n_tokens > budget``).

    Distribution: documents hash-shard by key (deterministic xxhash64,
    so the assignment is partitioning-independent and reproducible);
    each shard's greedy runs independently over Arrow batches
    (applyInPandas — the greedy is inherently order-sequential, which
    is exactly the plan-lint-honest reason this is not an expression).
    Sharding means bins never mix documents across shards; with
    thousands of documents per shard every shard sees the same size
    distribution, so realized waste stays within noise of a global
    greedy while scaling linearly. Per-shard cost is O(n log n) via a
    sorted remaining-capacity list."""
    if budget < 1:
        raise ValueError(f"bin_pack_sequences: budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(
            f"bin_pack_sequences: n_shards must be >= 1, got {n_shards}"
        )
    key_dt = dict(df.dtypes)[key_col]
    out_schema = (
        f"`{key_col}` {key_dt}, n_tokens long, shard long, bin_id long"
    )
    slim = df.select(
        F.col(key_col),
        F.col(token_col).cast("long").alias("_tok"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
        .cast("long")
        .alias("shard"),
    )

    def _pack(pdf):
        import pandas as pd

        # Non-positive sizes corrupt the greedy: a 0-token doc opens a
        # full-capacity bin no size==budget doc can ever join, and a
        # negative size breaks the sorted remaining-capacity invariant.
        # Token counts come from upstream tokenizers and must be >= 1;
        # anything else is a data bug to surface, not absorb.
        if len(pdf) and (
            pdf["_tok"].isna().any() or int(pdf["_tok"].min()) <= 0
        ):
            mask = pdf["_tok"].isna() | (pdf["_tok"] <= 0)
            bad = pdf.loc[mask, key_col].iloc[0]
            raise ValueError(
                f"bin_pack_sequences: non-positive or null token count "
                f"for key={bad!r}; token counts must be >= 1"
            )
        pdf = pdf.sort_values(
            ["_tok", key_col], ascending=[False, True], kind="mergesort"
        )
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        remaining: list[tuple[int, int]] = []  # sorted (capacity_left, bin)
        next_bin = 0
        bins = []
        for size in pdf["_tok"].tolist():
            size = int(size)
            i = bisect.bisect_left(remaining, (size,))
            if size < budget and i < len(remaining):
                rem, b = remaining.pop(i)
                if rem - size > 0:
                    bisect.insort(remaining, (rem - size, b))
            else:
                b = next_bin
                next_bin += 1
                if budget - size > 0:
                    bisect.insort(remaining, (budget - size, b))
            bins.append(shard * (1 << 40) + b)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].values,
                "n_tokens": pdf["_tok"].values,
                "shard": pdf["shard"].values,
                "bin_id": bins,
            }
        )

    return slim.groupBy("shard").applyInPandas(_pack, out_schema)
