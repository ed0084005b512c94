"""Catalog model: tables, columns, primary keys.

Parity targets:
- ``SqlTable`` — common/SqlTable.java:26-37 (the reference misspells its
  column list field "cloumnList"; we do not reproduce the typo).
- ``SqlColumn`` — common/SqlColumn.java:20-26.
- Table-exclusion filter — common/ServerUtil.java:126-134 (spec split at
  :248-250 on ``-``).
- PK choice with first-column fallback — common/ServerUtil.java:234-246.
  NOTE: the fallback is a known correctness hazard in the reference
  (OFFSET pagination over a non-unique sort can skip/repeat rows,
  SURVEY.md §7.4.3); our ranged scans key on it only when it is unique
  or when reading a full partition range (no per-page re-sort).
- Name mangling ``schema + "_" + name`` — common/SqlTable.java:64-68,
  common/BigQueryTableDestination.java:44.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import types as T

from .config import DLPProperties
from .types import to_spark_type


@dataclass(frozen=True)
class SqlColumn:
    """One column of a source table (common/SqlColumn.java:20-26)."""

    name: str
    ordinal_position: int
    data_type: str  # source type declaration, e.g. "varchar(50)"
    nullable: bool = True
    default_value: str | None = None
    primary_key: bool = False

    def to_struct_field(self, mode: str = "fidelity") -> T.StructField:
        return T.StructField(
            self.name,
            to_spark_type(self.data_type, mode=mode),
            self.nullable,
            metadata={
                "source_type": self.data_type,
                "ordinal": self.ordinal_position,
                "primary_key": self.primary_key,
                **({"default": self.default_value} if self.default_value is not None else {}),
            },
        )


@dataclass(frozen=True)
class SqlTable:
    """One source table (common/SqlTable.java:26-37)."""

    schema: str
    name: str
    table_type: str = "BASE TABLE"
    key: int = 0
    dlp_config: DLPProperties | None = None
    columns: tuple[SqlColumn, ...] = field(default_factory=tuple)

    @property
    def full_name(self) -> str:
        """``schema_name`` mangle (SqlTable.java:64-68)."""
        return f"{self.schema}_{self.name}"

    @property
    def qualified_name(self) -> str:
        return f"{self.schema}.{self.name}"

    def destination(self, dataset: str) -> str:
        """Dynamic-destination key ``dataset.schema_table``
        (common/BigQueryTableDestination.java:41-46)."""
        return f"{dataset}.{self.full_name}"

    def spark_schema(self, mode: str = "fidelity") -> T.StructType:
        cols = sorted(self.columns, key=lambda c: c.ordinal_position)
        return T.StructType([c.to_struct_field(mode) for c in cols])

    @property
    def primary_key_column(self) -> str | None:
        """PK column, else first-column fallback (ServerUtil.java:234-246).

        Returns None for a zero-column table.
        """
        for c in self.columns:
            if c.primary_key:
                return c.name
        ordered = sorted(self.columns, key=lambda c: c.ordinal_position)
        return ordered[0].name if ordered else None

    def with_dlp_config(self, cfg: DLPProperties | None) -> "SqlTable":
        return replace(self, dlp_config=cfg)


def parse_exclusion_spec(spec: str | None) -> frozenset[str]:
    """``"a-b-c"`` → {a, b, c} (ServerUtil.java:248-250)."""
    if not spec:
        return frozenset()
    return frozenset(s for s in spec.split("-") if s)


def apply_exclusions(tables: list[SqlTable], spec: str | None) -> list[SqlTable]:
    """Drop tables whose bare name is in the exclusion list
    (ServerUtil.java:126-134). An anti-semi-join at catalog scale —
    driver-side set lookup (the catalog is tiny; data-scale anti-joins
    are in the query surface)."""
    excluded = parse_exclusion_spec(spec)
    return [t for t in tables if t.name not in excluded]


def attach_dlp_configs(
    tables: list[SqlTable], configs: list[DLPProperties] | None
) -> list[SqlTable]:
    """Left-join table → first matching config by tableName
    (ServerUtil.java:274-286): a broadcast-style lookup join done
    driver-side because the catalog is small."""
    if not configs:
        return list(tables)
    by_name: dict[str, DLPProperties] = {}
    for cfg in configs:
        by_name.setdefault(cfg.table_name, cfg)  # first match wins (findFirst)
    return [t.with_dlp_config(by_name.get(t.name)) for t in tables]


def schema_drift(old, new):
    """Schema-drift report between two catalog snapshots — the check a
    recurring import pipeline runs before writing: the reference
    re-discovers every table's schema from INFORMATION_SCHEMA on each
    run (common/ServerUtil.java:47-52,179-204) and would silently
    produce a differently-shaped BigQuery table when the source
    evolved; this surfaces the evolution instead. Inputs are two
    DataFrames with ``(table_name, column_name, data_type)`` (one row
    per column — the natural materialization of the catalog scan);
    output is one row per difference: ``change`` ∈ 'added' /
    'removed' / 'retyped' with both sides' types attached. Unchanged
    columns are omitted. A rename reports as removed + added — the
    catalog carries no identity beyond the name.

    One full-outer equi-join on (table, column): catalogs are
    metadata-sized (thousands of rows at worst), so this is broadcast
    territory at any data scale — drift cost never depends on row
    counts.
    """
    from pyspark.sql import functions as F

    cols = {"table_name", "column_name", "data_type"}
    for side, df in (("old", old), ("new", new)):
        missing = cols - set(df.columns)
        if missing:
            raise ValueError(
                f"schema_drift: {side} snapshot is missing columns "
                f"{sorted(missing)}"
            )
    o = old.select(
        "table_name", "column_name", F.col("data_type").alias("old_type")
    )
    n = new.select(
        "table_name", "column_name", F.col("data_type").alias("new_type")
    )
    j = o.join(n, ["table_name", "column_name"], "full_outer")
    change = (
        F.when(F.col("old_type").isNull(), F.lit("added"))
        .when(F.col("new_type").isNull(), F.lit("removed"))
        .when(F.col("old_type") != F.col("new_type"), F.lit("retyped"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.withColumn("change", change).where(F.col("change").isNotNull())


def evolution_plan(old, new):
    """Schema-drift report + the APPLY verdict the warehouse sink
    executes (``Warehouse.write_evolved`` — sinks/warehouse.py): the
    reference silently reshapes its output when the source evolves
    (common/ServerUtil.java:47-52 re-discovers per run); this makes the
    policy explicit and auditable BEFORE any write happens.

    Adds ``action`` to each drift row:
    - added   → 'add_nullable' (widen the destination, history reads
                as NULL),
    - removed → 'fill_null' (incoming rows carry typed NULLs, the
                destination keeps its superset schema),
    - retyped → 'reject' (dead-letter: no append reconciles two types
                under one name).

    Same metadata-sized full-outer join as :func:`schema_drift`; the
    verdict is a pure CASE over the change column, so the plan stays a
    broadcast-scale expression chain."""
    from pyspark.sql import functions as F

    action = (
        F.when(F.col("change") == "added", F.lit("add_nullable"))
        .when(F.col("change") == "removed", F.lit("fill_null"))
        .otherwise(F.lit("reject"))
    )
    return schema_drift(old, new).withColumn("action", action)
