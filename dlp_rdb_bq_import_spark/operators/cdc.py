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
