"""Change application: MERGE/upsert and CDC change-log apply.

The reference only ever appends full reloads (DBImportPipeline.java:
115-132, WriteDisposition implied by streaming inserts); a warehouse
fed incrementally (see ``JdbcSource.read_incremental``) needs the
other half — applying a batch of changes to the existing table.
Expressed as pure DataFrame algebra so it works on any sink that can
rewrite a table/partition atomically:

- ``merge_upsert`` — updates win on key match, new keys append
  (MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT). One shuffle
  on the key (the anti join and the union share it); with a broadcast-
  sized change batch the base table never shuffles at all.
- ``apply_changes`` — full CDC: a change log with an op column
  (upsert/delete) and a sequence column; the latest change per key
  wins, deletes drop the row. The per-key latest is a window over the
  change batch only — the (small) change side pays the sort, the base
  table joins once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    broadcast_updates: bool = False,
) -> DataFrame:
    """Rows of ``base`` whose key is untouched + every ``updates`` row.

    ``broadcast_updates=True`` hints the (keys-only) update side as a
    broadcast so the base table never shuffles — use it when the CDC
    batch is known-small. Default is a plain join: a reload-sized batch
    would blow Spark's broadcast limit / driver memory, and AQE will
    still promote genuinely small sides to broadcast at runtime."""
    touched = updates.select(*key_cols)
    if broadcast_updates:
        touched = F.broadcast(touched)
    return base.join(touched, key_cols, "left_anti").unionByName(updates)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "_op",
    seq_col: str = "_seq",
    broadcast_changes: bool = False,
) -> DataFrame:
    """Apply a CDC batch: for each key keep only the latest change (max
    ``seq_col``, ties broken by op with delete winning — a delete and
    upsert at the same sequence is a malformed feed; choosing delete is
    the conservative read). ``op_col`` values: 'upsert' | 'delete'.

    ``broadcast_changes`` mirrors ``merge_upsert``'s flag: opt-in hint
    for known-small batches; default is a shuffle join that works at
    any batch size (AQE still broadcasts small sides at runtime)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.when(F.col(op_col) == "delete", 0).otherwise(1)
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = latest.where(F.col(op_col) == "upsert").drop(op_col, seq_col)
    touched = latest.select(*key_cols)
    if broadcast_changes:
        touched = F.broadcast(touched)
    return base.join(touched, key_cols, "left_anti").unionByName(survivors)


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "_op",
    seq_col: str = "_seq",
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a CDC change log:
    every upsert opens a version valid from its sequence number until
    the key's next change (upsert or delete); a delete closes the
    prior version and contributes no row. Output = payload columns +
    ``valid_from``, ``valid_to`` (null = still current), ``is_current``.

    One shuffle + per-key sort (a single ``lead`` window over the
    change log); the dimension history never joins anything here, so
    the cost is O(|changes|) regardless of dimension width. Feed must
    be well-formed: one change per (key, seq).

    The reference only ever snapshots full reloads; SCD2 is the
    standard warehouse answer to "what did this row say when the fact
    happened" — pair with ``scd2_lookup`` for the point-in-time join.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    v = changes.withColumn("valid_to", F.lead(seq_col).over(w))
    return (
        v.where(F.col(op_col) == "upsert")
        .withColumn("valid_from", F.col(seq_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col, seq_col)
    )


def scd2_lookup(
    facts: DataFrame,
    versions: DataFrame,
    on: str | list[str],
    fact_seq_col: str,
) -> DataFrame:
    """Point-in-time join: each fact row matched to the dimension
    version whose validity interval contains the fact's sequence/time.

    Composed from ``joins.asof_join`` (backward as-of on valid_from —
    one shuffle, no candidate pairs) + a validity filter: the as-of
    candidate is the version opened at-or-before the fact, and it
    matches unless a delete closed it before the fact happened
    (valid_to <= fact_seq → nulls, preserving the fact row like a left
    join against a gap in history)."""
    from .joins import asof_join

    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(facts.columns) & set(versions.columns)) - set(keys)
    if clash:
        # asof_join would emit these as r_<name>; referencing them here
        # by the original name would silently resolve to the FACT's
        # column — refuse instead of producing wrong matches
        raise ValueError(
            f"column name collision outside join keys: {sorted(clash)}; "
            "rename one side before the lookup"
        )
    out = asof_join(
        facts, versions, on=keys, left_ts=fact_seq_col, right_ts="valid_from"
    )
    ver_cols = [c for c in versions.columns if c not in keys + ["valid_from"]]
    gap = F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col(fact_seq_col))
    nulled = [
        F.when(gap, F.lit(None)).otherwise(F.col(c)).alias(c)
        for c in ver_cols + ["valid_from"]
    ]
    return out.select(*facts.columns, *nulled)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level reconciliation of two snapshots of one logical table —
    the data-diff primitive behind migration validation, replication
    audits, and CDC backfills (what changed between yesterday's load
    and today's?).

    Output: ``keys…, change_type ('added'|'removed'|'changed'[|'unchanged']),
    old_<c>, new_<c> for each compare col`` — added rows have NULL
    old_*, removed rows NULL new_*. Value comparison is null-safe (NULL
    vs NULL is unchanged; NULL vs value is a change).

    Keys must be non-null and unique per snapshot (the usual snapshot
    contract; a NULL key cannot be matched across snapshots).

    Scale shape: ONE full-outer shuffle join co-partitioned on the key
    — both sides hash to the same exchange, no broadcast assumption (at
    100 TB both snapshots are big). Everything else is scan-local
    column arithmetic, and ``include_unchanged=False`` (default) prunes
    the overwhelmingly-common case out of the result early.
    """
    reserved = {"change_type", "_old_present", "_new_present"}
    reserved |= {f"old_{c}" for c in compare_cols} | {f"new_{c}" for c in compare_cols}
    clash = reserved & set(old.columns) | reserved & set(new.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")

    o = old.select(
        *keys,
        F.lit(1).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, on=keys, how="full_outer")

    # empty compare_cols is a legitimate key-presence-only diff: rows in
    # both snapshots are 'unchanged' by definition
    differs = F.lit(False)
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = differs | d
    change = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *keys,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out
