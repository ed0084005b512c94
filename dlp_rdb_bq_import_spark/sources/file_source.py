"""Delimited/JSON-lines file source: a directory of ``<table>.csv`` /
``<table>.jsonl`` files as a catalog (S11-ext of SURVEY.md §2.1 — the
formats a user migrating off the reference's JDBC-only surface brings
along with parquet).

Schema strategy mirrors the reference's two-step catalog read
(ServerUtil.java:179-204 column scan → typed row mapping,
TableToDbRowFn.java:190-238): a bounded sampling pass infers the
schema once at catalog time (``samplingRatio``/``inferSchema`` read a
prefix, not the whole file), and the full scan then uses that frozen
schema — so a late malformed row cannot silently flip a column to
string between catalog time and read time.

The full scan is ``spark.read.text`` + ``from_csv``/``from_json``
expressions rather than the csv/json *source*: parsing as an
expression keeps the raw line alongside the parsed struct, so
malformed rows route to a quarantine DataFrame (the file-format
analogue of the reference's failed-insert dead letters,
DBImportPipeline.java:134-146) without the source-level restriction
that forbids corrupt-column-only queries, and without caching the
scan. The text scan is splittable, so partitioning follows the
session's maxPartitionBytes exactly as parquet does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import SqlColumn, SqlTable
from .base import Source
from .parquet_source import _PK_PATTERN, _SPARK_TO_SOURCE_TYPE

_EXTS = {".csv": "csv", ".jsonl": "json", ".json": "json", ".ndjson": "json"}

CORRUPT_COL = "_corrupt"


class FileDirSource(Source):
    """One table per ``<name>.<ext>`` file; ext picks the reader."""

    def __init__(
        self,
        directory: str,
        schema_name: str = "main",
        csv_options: dict[str, str] | None = None,
        infer_rows: int = 10_000,
    ):
        self.directory = directory.rstrip("/")
        self.schema_name = schema_name
        self.csv_options = {"header": "true", **(csv_options or {})}
        self.infer_rows = infer_rows
        self._schemas: dict[str, T.StructType] = {}

    def _entries(self) -> list[tuple[str, str, str]]:
        out = []
        for fname in sorted(os.listdir(self.directory)):
            stem, ext = os.path.splitext(fname)
            if ext in _EXTS:
                out.append((stem, _EXTS[ext], os.path.join(self.directory, fname)))
        return out

    def _infer(self, spark: SparkSession, fmt: str, path: str) -> T.StructType:
        if path not in self._schemas:
            # Bounded inference: materialize only the first infer_rows
            # lines via the text source and infer over that prefix
            # (a .limit() AFTER .csv(inferSchema=true) would not bound
            # the inference scan — inference runs over the whole file
            # when the reader is defined, before the limit applies).
            # The header is split off MANUALLY: Spark's csv-over-dataset
            # reader with header=true drops every line byte-identical to
            # the header, which would hide header-identical data rows
            # from inference.
            lines = [
                r["value"]
                for r in spark.read.text(path).limit(self.infer_rows + 1).collect()
            ]
            if fmt == "csv":
                has_header = self.csv_options.get("header", "true").lower() == "true"
                header_line = lines[0] if has_header and lines else None
                data_lines = lines[1:] if has_header else lines
                names = None
                if header_line is not None:
                    import csv as _csv
                    import io

                    sep = self.csv_options.get(
                        "sep", self.csv_options.get("delimiter", ",")
                    )
                    names = next(_csv.reader(io.StringIO(header_line), delimiter=sep))
                if not data_lines:
                    # header-only file: all-string columns
                    self._schemas[path] = T.StructType(
                        [T.StructField(n, T.StringType()) for n in (names or [])]
                    )
                    return self._schemas[path]
                opts = {k: v for k, v in self.csv_options.items() if k != "header"}
                sample = (
                    spark.read.options(**opts)
                    .option("header", "false")
                    .option("inferSchema", "true")
                    .csv(spark.sparkContext.parallelize(data_lines, 1))
                )
                if names is not None and len(names) == len(sample.columns):
                    sample = sample.toDF(*names)
            else:
                sample = spark.read.json(spark.sparkContext.parallelize(lines, 1))
            self._schemas[path] = sample.schema
        return self._schemas[path]

    def _reader(self, spark: SparkSession, fmt: str, path: str) -> DataFrame:
        """(parsed struct ``r``, raw line) rows; ``r[CORRUPT_COL]`` is
        non-null exactly for lines that failed the frozen schema."""
        schema = self._infer(spark, fmt, path)
        with_corrupt = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        raw = spark.read.text(path)
        opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
        has_header = self.csv_options.get("header", "true").lower() == "true"
        if fmt == "csv":
            if has_header:
                # The header is data to from_csv — drop the first
                # PHYSICAL line only. For a single-file text scan the
                # file's first line is row 0 of partition 0, i.e. the
                # unique row with monotonically_increasing_id() == 0;
                # a data row that happens to be byte-identical to the
                # header survives (filtering on line CONTENT would
                # silently drop it).
                raw = raw.withColumn("_line_no", F.monotonically_increasing_id()).where(
                    F.col("_line_no") != 0
                ).drop("_line_no")
            csv_opts = {
                **{k: v for k, v in self.csv_options.items() if k != "header"},
                **opts,
            }
            ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in with_corrupt)
            parsed = F.from_csv(F.col("value"), ddl, csv_opts)
        else:
            parsed = F.from_json(F.col("value"), with_corrupt, opts)
        return raw.select(parsed.alias("r"), F.col("value").alias("_raw"))

    def list_tables(self, spark: SparkSession) -> list[SqlTable]:
        tables: list[SqlTable] = []
        for i, (name, fmt, path) in enumerate(self._entries()):
            schema = self._infer(spark, fmt, path)
            cols = []
            for ordinal, f in enumerate(schema.fields, start=1):
                src_type = _SPARK_TO_SOURCE_TYPE.get(f.dataType.simpleString(), "VARCHAR")
                is_pk = ordinal == 1 and bool(_PK_PATTERN.match(f.name))
                cols.append(
                    SqlColumn(f.name, ordinal, src_type, nullable=f.nullable, primary_key=is_pk)
                )
            tables.append(
                SqlTable(schema=self.schema_name, name=name, key=i, columns=tuple(cols))
            )
        return tables

    def row_count(self, spark: SparkSession, table: SqlTable) -> int:
        return self.read_table(spark, table).count()

    def _path_for(self, table: SqlTable) -> tuple[str, str]:
        for name, fmt, path in self._entries():
            if name == table.name:
                return fmt, path
        raise KeyError(f"no file for table {table.name!r} in {self.directory}")

    def read_table(
        self, spark: SparkSession, table: SqlTable, offset_count: int = 500
    ) -> DataFrame:
        """Clean rows only, typed to the frozen schema."""
        fmt, path = self._path_for(table)
        return (
            self._reader(spark, fmt, path)
            .where(F.col(f"r.{CORRUPT_COL}").isNull())
            .select("r.*")
            .drop(CORRUPT_COL)
        )

    def read_corrupt(self, spark: SparkSession, table: SqlTable) -> DataFrame:
        """The dead-letter side: raw text of rows that failed the frozen
        schema (quarantine feed, S9 parity)."""
        fmt, path = self._path_for(table)
        return (
            self._reader(spark, fmt, path)
            .where(F.col(f"r.{CORRUPT_COL}").isNotNull())
            .select(F.col("_raw").alias("raw"))
        )
