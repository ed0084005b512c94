"""BigQuery adapter for the dynamic-destination warehouse sink
(VERDICT r12 task 6) — the actual destination of the reference import
pipeline (DBImportPipeline.java:115-132: per-table dynamic
destinations, create-on-demand, WRITE_APPEND), written against the
PUBLIC ``google-cloud-bigquery`` client the same way
``jdbc_warehouse.py`` is written against JDBC:

- IMPORT-GUARDED: the client library is imported only inside
  ``_default_client()`` when no ``client_factory`` is injected;
  constructing the sink costs nothing without the package, and a
  missing install raises at first use with an actionable message.
- SEAM-TESTED: ``client_factory`` injects any object with the small
  client protocol used here (``create_dataset``, ``get_table``,
  ``load_table_from_file``, ``copy_table``, ``delete_table``,
  ``list_rows``) — the contract tests drive the adapter with an
  in-memory fake through the same surface tests the JDBC/parquet
  warehouses pass, without the package installed.

Staged-atomic delivery, restated in BigQuery job primitives:

- every attempt loads the DataFrame (written to parquet locally; at
  deployment scale the files would sit on GCS and a single multi-URI
  load job would ingest them) into a FRESH staging table — a failed
  attempt leaves only an orphan staging table, never destination rows;
- publish is ONE server-side COPY JOB, which BigQuery executes
  atomically: ``WRITE_APPEND`` for append (an interrupted copy lands
  zero rows, so the bounded retry can never double-append),
  ``WRITE_TRUNCATE`` + ``CREATE_IF_NEEDED`` for create-on-demand and
  overwrite (the destination swaps complete-or-not-at-all);
- the staging DELETE after a committed copy is best-effort CLEANUP
  outside the retryable unit (the jdbc_warehouse r13 discipline: an
  orphan staging table is harmless, a double append is not).

``read`` surfaces rows via ``list_rows`` → Arrow → DataFrame — the
contract/readback surface; a production read path would use the Spark
BigQuery connector, which is a cluster deployment concern, not an
adapter one.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import traceback
import uuid

from pyspark.sql import DataFrame, SparkSession

from .warehouse import WriteResult


class TableNotFound(Exception):
    """Adapter-level not-found: fakes raise it directly; real-client
    calls translate ``google.api_core.exceptions.NotFound`` (detected
    by class name, so the package is never imported here)."""


def _is_not_found(e: Exception) -> bool:
    return isinstance(e, TableNotFound) or type(e).__name__ == "NotFound"


class BigQueryWarehouse:
    """Dataset/table namespace on one BigQuery project. ``dataset``
    maps to a BigQuery dataset (created on demand), ``full_name`` to a
    table; write/read/table_exists mirror the parquet and JDBC
    warehouses exactly."""

    def __init__(self, project: str, client_factory=None, location: str = "US"):
        if not project:
            raise ValueError("BigQueryWarehouse requires a project id")
        self.project = project
        self.location = location
        self._client_factory = client_factory
        self._client = None

    # -- client plumbing ----------------------------------------------------

    def _default_client(self):  # pragma: no cover - package not in container
        try:
            from google.cloud import bigquery
        except ImportError as e:
            raise ImportError(
                "BigQueryWarehouse needs the 'google-cloud-bigquery' package "
                "(pip install google-cloud-bigquery) or an injected "
                "client_factory"
            ) from e
        return bigquery.Client(project=self.project, location=self.location)

    @property
    def client(self):
        if self._client is None:
            self._client = (
                self._client_factory() if self._client_factory else self._default_client()
            )
        return self._client

    def qualified(self, dataset: str, full_name: str) -> str:
        return f"{self.project}.{dataset}.{full_name}"

    # -- surface (parquet/JDBC warehouse parity) ----------------------------

    def table_exists(self, spark: SparkSession, dataset: str, full_name: str) -> bool:
        try:
            self.client.get_table(self.qualified(dataset, full_name))
            return True
        except Exception as e:
            if _is_not_found(e):
                return False
            raise

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
        dest = self.qualified(dataset, full_name)
        last: str | None = None
        for attempt in range(1, max_retries + 2):
            staging = self.qualified(
                dataset, f"{full_name}_stg{uuid.uuid4().hex[:8]}"
            )
            try:
                self.client.create_dataset(
                    f"{self.project}.{dataset}", exists_ok=True
                )
                self._load_staging(df, staging)
                self._publish(staging, dest, dataset, full_name, mode)
                return WriteResult(full_name, dest, "ok", attempts=attempt)
            except Exception as e:  # dead-letter, not crash (S9)
                last = f"{e}\n{traceback.format_exc()}"
                try:
                    self.client.delete_table(staging, not_found_ok=True)
                except Exception:
                    pass
        return WriteResult(full_name, dest, "failed", last, attempts=max_retries + 1)

    # -- internals ----------------------------------------------------------

    def _load_staging(self, df: DataFrame, staging: str) -> None:
        """One load attempt: DataFrame → parquet part files → load jobs
        into the fresh staging table (the retryable unit; tests inject
        failures here, exactly like the JDBC warehouse's
        ``_write_attempt``)."""
        tmp = tempfile.mkdtemp(prefix="bqstage_")
        try:
            df.write.mode("overwrite").parquet(tmp)
            parts = sorted(
                os.path.join(tmp, f)
                for f in os.listdir(tmp)
                if f.endswith(".parquet")
            )
            for p in parts:
                with open(p, "rb") as fh:
                    job = self.client.load_table_from_file(
                        fh, staging, job_config=self._parquet_load_config()
                    )
                job.result()  # surface load errors inside THIS attempt
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def _parquet_load_config(self):
        """Real-client LoadJobConfig(source_format=PARQUET); fakes that
        don't ship the config classes get None and must default."""
        try:  # pragma: no cover - package not in container
            from google.cloud import bigquery

            return bigquery.LoadJobConfig(
                source_format=bigquery.SourceFormat.PARQUET
            )
        except ImportError:
            return None

    def _copy_config(self, mode: str):
        try:  # pragma: no cover - package not in container
            from google.cloud import bigquery

            return bigquery.CopyJobConfig(
                write_disposition=(
                    bigquery.WriteDisposition.WRITE_APPEND
                    if mode == "append"
                    else bigquery.WriteDisposition.WRITE_TRUNCATE
                ),
                create_disposition=bigquery.CreateDisposition.CREATE_IF_NEEDED,
            )
        except ImportError:
            return {"mode": mode}  # fakes interpret the plain dict

    def _publish(
        self, staging: str, dest: str, dataset: str, full_name: str, mode: str
    ) -> None:
        exists = False
        try:
            self.client.get_table(dest)
            exists = True
        except Exception as e:
            if not _is_not_found(e):
                raise
        effective = "overwrite" if (mode == "overwrite" or not exists) else "append"
        # ONE atomic server-side copy job — the retryable unit ends
        # when it commits
        self.client.copy_table(
            staging, dest, job_config=self._copy_config(effective)
        ).result()
        # best-effort cleanup OUTSIDE the retryable unit (a failed
        # delete after a committed copy must not re-enter the retry
        # loop and double-append — the jdbc_warehouse discipline)
        try:
            self.client.delete_table(staging, not_found_ok=True)
        except Exception:
            pass

    def read(self, spark: SparkSession, dataset: str, full_name: str) -> DataFrame:
        rows = self.client.list_rows(self.qualified(dataset, full_name))
        arrow = rows.to_arrow()
        return spark.createDataFrame(arrow.to_pandas())
