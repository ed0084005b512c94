"""ORC / Avro directory source (VERDICT r13 task 5): the
``file_source`` catalog discipline — frozen catalog-time schema +
malformed-input quarantine — extended to the two self-describing
binary formats a warehouse migration brings along (S11-ext of
SURVEY.md §2.1; the reference's catalog surface is format-agnostic —
ServerUtil.java:179-204 reads INFORMATION_SCHEMA whatever backs it).

Binary columnar formats shift where corruption is detectable. CSV and
JSONL fail per LINE, so :class:`FileDirSource` quarantines rows. ORC
and Avro are self-describing per FILE (footer/header schema, internal
checksums): a damaged file fails at open, and the real-world drift
mode is a part file whose embedded schema no longer matches the
catalog's (a producer deployed a new writer mid-directory). The
quarantine unit here is therefore the FILE:

- SCHEMA FREEZE: the catalog schema is read ONCE from the first
  readable part file and pinned; every later read passes it
  explicitly, so a new file cannot silently widen or retype a column
  between catalog time and read time (the same contract
  ``file_source`` gets from bounded inference).
- CONFORMANCE SPLIT: at catalog time every part file's embedded
  schema is probed; unreadable files and files whose schema is not
  identical to the frozen one are EXCLUDED from ``read_table`` and
  surfaced by ``read_corrupt`` as ``(path, reason)`` rows — the
  dead-letter feed, S9 parity at file grain.

ORC ships inside Spark. Avro is Spark's one EXTERNAL built-in module
(the ``spark-avro`` package must be on the classpath per its public
docs); :func:`avro_available` probes the session and the source
raises a clear error instead of Spark's opaque "failed to find data
source" when it is absent — the same import-guard discipline as the
BigQuery/PubSub adapters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import SqlColumn, SqlTable
from .base import Source
from .parquet_source import _PK_PATTERN, _SPARK_TO_SOURCE_TYPE

_EXTS = {".orc": "orc", ".avro": "avro"}


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro datasource module is deployed. Probed
    via the class lookup (cheap, no I/O); cached per JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroFileFormat"
        )
        return True
    except Exception:
        return False


class ColumnarDirSource(Source):
    """One table per ``<name>.orc`` / ``<name>.avro`` entry in a
    directory; an entry may be a single file or a directory of part
    files (the shape Spark's own writers produce)."""

    def __init__(self, directory: str, schema_name: str = "main"):
        self.directory = directory.rstrip("/")
        self.schema_name = schema_name
        self._frozen: dict[str, T.StructType] = {}
        self._split: dict[str, tuple[list[str], list[tuple[str, str]]]] = {}

    # -- catalog ------------------------------------------------------------

    def _entries(self) -> list[tuple[str, str, str]]:
        out = []
        for fname in sorted(os.listdir(self.directory)):
            stem, ext = os.path.splitext(fname)
            if ext in _EXTS:
                out.append((stem, _EXTS[ext], os.path.join(self.directory, fname)))
        return out

    def _part_files(self, fmt: str, path: str) -> list[str]:
        if os.path.isfile(path):
            return [path]
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(f".{fmt}") and not f.startswith(("_", "."))
        )

    def _probe(self, spark: SparkSession, fmt: str, path: str) -> None:
        """Freeze the schema off the first readable part file and
        split the rest into conforming vs quarantined."""
        if path in self._frozen:
            return
        if fmt == "avro" and not avro_available(spark):
            raise RuntimeError(
                "Avro source requires the spark-avro module (Spark's "
                "external built-in; deploy org.apache.spark:spark-avro "
                "per the public Avro Data Source Guide) — not found on "
                "this session's classpath"
            )
        good: list[str] = []
        bad: list[tuple[str, str]] = []
        frozen: T.StructType | None = None
        for f in self._part_files(fmt, path):
            try:
                sch = spark.read.format(fmt).load(f).schema
            except Exception as e:
                bad.append((f, f"unreadable: {type(e).__name__}: {str(e)[:200]}"))
                continue
            if frozen is None:
                frozen = sch
                good.append(f)
            elif sch == frozen:
                good.append(f)
            else:
                bad.append(
                    (
                        f,
                        "schema drift vs frozen catalog schema: "
                        f"{sch.simpleString()[:200]}",
                    )
                )
        if frozen is None:
            raise ValueError(f"no readable {fmt} part file under {path}")
        self._frozen[path] = frozen
        self._split[path] = (good, bad)

    def list_tables(self, spark: SparkSession) -> list[SqlTable]:
        tables: list[SqlTable] = []
        for i, (name, fmt, path) in enumerate(self._entries()):
            self._probe(spark, fmt, path)
            cols = []
            for ordinal, f in enumerate(self._frozen[path].fields, start=1):
                src_type = _SPARK_TO_SOURCE_TYPE.get(
                    f.dataType.simpleString(), "VARCHAR"
                )
                is_pk = ordinal == 1 and bool(_PK_PATTERN.match(f.name))
                cols.append(
                    SqlColumn(
                        f.name, ordinal, src_type,
                        nullable=f.nullable, primary_key=is_pk,
                    )
                )
            tables.append(
                SqlTable(schema=self.schema_name, name=name, key=i, columns=tuple(cols))
            )
        return tables

    def _path_for(self, table: SqlTable) -> tuple[str, str]:
        for name, fmt, path in self._entries():
            if name == table.name:
                return fmt, path
        raise KeyError(f"no {list(_EXTS)} entry for table {table.name!r}")

    # -- read paths ---------------------------------------------------------

    def read_table(
        self, spark: SparkSession, table: SqlTable, offset_count: int = 500
    ) -> DataFrame:
        """Conforming part files only, read under the FROZEN schema
        (passed explicitly — a drifted file added after catalog time
        is quarantined by the conformance split, never silently
        widened into the scan). ``offset_count`` is satisfied by the
        session's maxPartitionBytes split sizing, as for parquet."""
        fmt, path = self._path_for(table)
        self._probe(spark, fmt, path)
        good, _ = self._split[path]
        return (
            spark.read.format(fmt).schema(self._frozen[path]).load(good)
        )

    def read_corrupt(self, spark: SparkSession, table: SqlTable) -> DataFrame:
        """Dead-letter feed: one row per quarantined part file —
        ``(path string, reason string)``."""
        fmt, path = self._path_for(table)
        self._probe(spark, fmt, path)
        _, bad = self._split[path]
        return spark.createDataFrame(
            bad or [], schema="path string, reason string"
        )

    def row_count(self, spark: SparkSession, table: SqlTable) -> int:
        return self.read_table(spark, table).count()
