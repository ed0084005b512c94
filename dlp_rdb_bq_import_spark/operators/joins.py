"""Shuffle-discipline join utilities for the 100 TB posture.

Two techniques the mission calls for beyond what AQE gives for free:

- **Bucketed co-located joins** — persist both sides bucketed by the
  join key (``bucketBy`` + ``saveAsTable``); Spark then joins bucket i
  against bucket i with NO exchange on either side. For fact tables that
  are joined on the same key repeatedly (orders ⋈ lineitem every run),
  paying one bucketed write amortizes away every subsequent shuffle —
  at 100 TB the shuffle IS the job, so this is the single biggest lever
  a pipeline owner controls.

- **Salted skew joins** — when one key is pathologically hot (the
  "null customer", the empty document), AQE's skew splitting helps
  sort-merge joins but replicating the dimension side N ways and
  spreading the hot fact rows across N salt values bounds EVERY
  partition by construction. Exact same join result, no 2 GB partition
  limit violations, no straggler task.

Both are plan-shape-verified in tests (the bucketed join's physical plan
must contain no Exchange; the salted join must produce exactly the
plain-join result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a DataFrame bucketed (and optionally sorted) by the join
    key. Subsequent equi-joins between tables bucketed the same way on
    the same key run exchange-free. ``path`` makes it an external table
    (data at an explicit location instead of the session warehouse)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed saved tables; Catalyst recognizes the
    bucketing and plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a deterministic salt in
    [0, salt) (hash of the whole row via monotonically increasing id is
    NOT deterministic — we hash the key plus a per-row uniform draw from
    xxhash64 of all columns), the dimension side is replicated ``salt``
    ways, and the join key becomes (key, salt). Result rows are exactly
    those of ``facts.join(dim, on, how)`` for the supported ``how``
    values; every hot key's rows spread over ``salt`` partitions
    instead of one.

    Supported ``how``: inner, left/left_outer, left_semi, left_anti —
    the fact-preserving joins, where replicating the dim side cannot
    invent rows. right/full outer are rejected: an unmatched dim row
    exists ``salt`` times in the replicated side and would be emitted
    once per salt value; use AQE skew handling or pre-aggregate the dim
    side for those.

    Use when one side is small enough to replicate ``salt``× but too
    big (or too skew-prone) to broadcast outright; for genuinely small
    dims, ``F.broadcast`` remains the first choice.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — a replicated dim side would emit unmatched dim "
            f"rows {salt}x under right/full outer"
        )
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*facts.columns), F.lit(salt)).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_facts.join(exploded_dim, [on, "_salt"], how)
    return out.drop("_salt")
