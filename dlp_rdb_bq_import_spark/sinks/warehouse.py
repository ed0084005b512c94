"""Warehouse sink: per-table dynamic destinations + dead-letter capture.

Parity targets:
- Dynamic-destination write ``dataset.<schema>_<table>`` with
  create-table/dataset-on-demand and append semantics —
  DBImportPipeline.java:115-132, common/BigQueryTableDestination.java:41-68,
  dataset pre-create common/CreateTableMapDoFn.java:61-70. Spark has no
  per-row dynamic table sink; the idiomatic (and at 100 TB, faster)
  equivalent is a driver-side loop issuing one atomic columnar write per
  table — each write is a distributed job, the loop is metadata-only.
- Write method: the reference uses STREAMING_INSERTS with transient
  retry (DBImportPipeline.java:130) while its README claims load jobs
  (README.md:181). We use atomic batch writes (parquet append), matching
  the README's stated intent; retries come free from Spark task
  re-execution (SURVEY.md §4.2).
- Failed-insert capture → quarantine (DBImportPipeline.java:134-146) and
  dead-letter union+log (DBImportPipeline.java:148-162): errors become
  rows in a quarantine parquet table instead of log lines.
"""

from __future__ import annotations

import json
import os
import traceback
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class WriteResult:
    table: str
    destination: str
    status: str  # "ok" | "failed"
    error: str | None = None


class Warehouse:
    """A directory-backed dataset namespace: ``<root>/<dataset>/<table>/``
    parquet directories, created on demand."""

    def __init__(self, root: str):
        self.root = root

    def table_path(self, dataset: str, full_name: str) -> str:
        return os.path.join(self.root, dataset, full_name)

    def write(
        self,
        df: DataFrame,
        dataset: str,
        full_name: str,
        mode: str = "append",
    ) -> WriteResult:
        path = self.table_path(dataset, full_name)
        try:
            df.write.mode(mode).parquet(path)
            return WriteResult(full_name, path, "ok")
        except Exception as e:  # dead-letter, not crash (S9)
            return WriteResult(full_name, path, "failed", f"{e}\n{traceback.format_exc()}")

    def read(self, spark: SparkSession, dataset: str, full_name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(dataset, full_name))

    def quarantine(self, dataset: str, records: list[dict]) -> None:
        """Dead-letter channel: one JSONL file per job run (replaces the
        reference's Flatten→LOG.error at DBImportPipeline.java:148-162
        with something queryable)."""
        if not records:
            return
        qdir = os.path.join(self.root, dataset, "_quarantine")
        os.makedirs(qdir, exist_ok=True)
        path = os.path.join(qdir, f"deadletter-{len(os.listdir(qdir))}.jsonl")
        with open(path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
