"""JDBC warehouse sink — the dynamic-destination table writer (S8)
against a REAL SQL engine instead of the parquet stand-in.

The reference's sink is BigQuery with per-table dynamic destinations
and create-on-demand (DBImportPipeline.java:115-132); this adapter
gives the same ``write(df, dataset, table) -> WriteResult`` surface as
``sinks/warehouse.py`` but lands rows in any JDBC engine via Spark's
built-in JDBC writer — exercised LIVE against in-process Apache Derby
in tests (the same public driver the JDBC source tests use), and
engine-generic for PostgreSQL/MySQL/SQL Server (the publish SQL is
ANSI ``INSERT INTO … SELECT`` plus one RENAME).

Delivery semantics — the staged-atomic discipline of the parquet
warehouse, restated in SQL:

- every attempt writes to a FRESH staging table (Spark JDBC overwrite
  — a failed attempt leaves only an orphan staging table, never rows
  in the destination);
- create-on-demand publish is ``RENAME TABLE staging TO final``
  (atomic DDL — the destination appears fully populated or not at
  all);
- append publish is ONE ``INSERT INTO final SELECT * FROM staging``
  statement — statement atomicity means a failed append inserts
  nothing, so the bounded retry can never double-append;
- overwrite publish drops the destination first, then renames.

Failed attempts clean their staging table best-effort and return a
``WriteResult(status="failed")`` with the error — dead-letter, not
crash (the S9 contract), matching the parquet warehouse exactly.
"""

from __future__ import annotations

import re
import traceback
import uuid

from pyspark.sql import DataFrame, SparkSession

from .warehouse import WriteResult

_IDENT = re.compile(r"^[A-Za-z][A-Za-z0-9_]*$")


def _ident(name: str, what: str) -> str:
    """Validate-and-normalize an identifier: JDBC DDL is assembled
    text, so anything outside [A-Za-z0-9_] is rejected rather than
    quoted (the import job's sanitize step runs upstream)."""
    if not _IDENT.match(name or ""):
        raise ValueError(f"unusable {what} identifier: {name!r}")
    return name.upper()  # Derby/ANSI fold unquoted identifiers up


class JdbcWarehouse:
    """Dataset/table namespace on one JDBC engine. ``dataset`` maps to
    a SQL schema (created on demand); ``full_name`` to a table."""

    def __init__(self, url: str, driver: str | None = None):
        self.url = url
        self.driver = driver

    # -- naming -------------------------------------------------------------

    def qualified(self, dataset: str, full_name: str) -> str:
        return f"{_ident(dataset, 'dataset')}.{_ident(full_name, 'table')}"

    # -- driver-side SQL plumbing -------------------------------------------

    def _connect(self, spark: SparkSession):
        return spark._jvm.java.sql.DriverManager.getConnection(self.url)

    def _execute(self, spark: SparkSession, *statements: str) -> None:
        conn = self._connect(spark)
        try:
            st = conn.createStatement()
            try:
                for sql in statements:
                    st.execute(sql)
            finally:
                st.close()
        finally:
            conn.close()

    def _ensure_schema(self, spark: SparkSession, dataset: str) -> None:
        try:
            self._execute(spark, f"CREATE SCHEMA {_ident(dataset, 'dataset')}")
        except Exception as e:  # already exists — engine-specific code
            if "X0Y68" not in str(e) and "already exists" not in str(e).lower():
                raise

    def table_exists(self, spark: SparkSession, dataset: str, full_name: str) -> bool:
        conn = self._connect(spark)
        try:
            rs = conn.getMetaData().getTables(
                None, _ident(dataset, "dataset"), _ident(full_name, "table"), None
            )
            try:
                return bool(rs.next())
            finally:
                rs.close()
        finally:
            conn.close()

    # -- write/read surface (parquet-warehouse parity) ----------------------

    def write(
        self,
        df: DataFrame,
        dataset: str,
        full_name: str,
        mode: str = "append",
        max_retries: int = 2,
    ) -> WriteResult:
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported write mode {mode!r}")
        spark = df.sparkSession
        dest = self.qualified(dataset, full_name)
        last: str | None = None
        for attempt in range(1, max_retries + 2):
            staging = (
                f"{_ident(dataset, 'dataset')}."
                f"{_ident(full_name, 'table')}_STG{uuid.uuid4().hex[:8].upper()}"
            )
            try:
                self._ensure_schema(spark, dataset)
                self._write_attempt(df, staging)
                self._publish(spark, staging, dataset, full_name, mode)
                return WriteResult(full_name, dest, "ok", attempts=attempt)
            except Exception as e:  # dead-letter, not crash (S9)
                last = f"{e}\n{traceback.format_exc()}"
                try:
                    self._execute(spark, f"DROP TABLE {staging}")
                except Exception:
                    pass
        return WriteResult(full_name, dest, "failed", last, attempts=max_retries + 1)

    def _write_attempt(self, df: DataFrame, staging: str) -> None:
        """One staged write (the retryable unit; tests inject
        flakiness by overriding this — the parquet-warehouse seam)."""
        w = df.write.format("jdbc").option("url", self.url).option(
            "dbtable", staging
        )
        if self.driver:
            w = w.option("driver", self.driver)
        w.mode("overwrite").save()

    def _publish(
        self,
        spark: SparkSession,
        staging: str,
        dataset: str,
        full_name: str,
        mode: str,
    ) -> None:
        dest = self.qualified(dataset, full_name)
        exists = self.table_exists(spark, dataset, full_name)
        if mode == "overwrite" and exists:
            self._execute(spark, f"DROP TABLE {dest}")
            exists = False
        if not exists:
            # create-on-demand: atomic DDL rename — the destination
            # appears fully populated or not at all
            self._execute(
                spark,
                f"RENAME TABLE {staging} TO {_ident(full_name, 'table')}",
            )
            return
        # append: ONE retryable statement — statement atomicity means a
        # failed insert lands zero rows and the retry cannot
        # double-append. The staging DROP is best-effort CLEANUP, not
        # part of the retryable unit: once the INSERT commits the write
        # succeeded, and surfacing a failed DROP would re-enter the
        # retry loop and re-insert committed rows (an orphan _STG table
        # is harmless; a double append is not).
        self._execute(spark, f"INSERT INTO {dest} SELECT * FROM {staging}")
        try:
            self._execute(spark, f"DROP TABLE {staging}")
        except Exception:
            pass

    def read(self, spark: SparkSession, dataset: str, full_name: str) -> DataFrame:
        r = spark.read.format("jdbc").option("url", self.url).option(
            "dbtable", self.qualified(dataset, full_name)
        )
        if self.driver:
            r = r.option("driver", self.driver)
        return r.load()
