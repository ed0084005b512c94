"""Job configuration.

- ``DLPProperties`` — per-table transform config, parity with
  common/DLPProperties.java:21-26 and the JSON shape of
  sqlserver/dlp_config.json:15-31 ({tableName, batchSize, deidTemplate,
  inspTemplate?}). The reference parses batchSize but never uses it to
  size requests (dead config, DLPProperties.java:45-51 / SURVEY.md §4.2);
  we honor it as the Arrow max-records-per-batch hint for the tokenize
  path so the knob actually works.
- ``ImportJobOptions`` / ``ReidJobOptions`` — parity with
  common/DBImportPipelineOptions.java:22-53 and
  common/BQReIdentificationPipelineOptions.java:7-40.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

# Default reid query — common/BQReIdentificationPipelineOptions.java:15-17:
# projection + CAST filters + GROUP BY dedup.
DEFAULT_REID_QUERY = (
    "SELECT id, card_number, Card_Holders_Name FROM `{table}` "
    "WHERE CAST(credit_limit AS int64) > 100000 AND CAST(age AS int64) > 50 "
    "GROUP BY id, card_number, Card_Holders_Name"
)

# Pub/Sub-style sink batching limits — BQReidentificationPipeline.java:70-72.
MESSAGE_BATCH_MAX_MESSAGES = 1000
MESSAGE_BATCH_MAX_BYTES = 10_000


@dataclass(frozen=True)
class DLPProperties:
    """Per-table tokenization binding (common/DLPProperties.java:21-26)."""

    table_name: str
    batch_size: int = 500
    deid_template: str | None = None
    insp_template: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DLPProperties":
        return cls(
            table_name=d["tableName"],
            batch_size=int(d.get("batchSize", 500)),
            deid_template=d.get("deidTemplate"),
            insp_template=d.get("inspTemplate"),
        )


def load_dlp_configs(path_or_json: str) -> list[DLPProperties]:
    """Read the config array from a JSON literal, a local path, or a
    URL-scheme path (``gs://`` / ``s3://`` / ...) — the reference's
    actual interface is a GCS object (ServerUtil.java:252-272). Remote
    schemes go through ``fsspec`` (the standard pluggable-filesystem
    interface; gcsfs/s3fs register themselves with it) when installed,
    with a clear error otherwise."""
    if path_or_json.lstrip().startswith("["):
        raw = json.loads(path_or_json)
    elif "://" in path_or_json:
        try:
            import fsspec
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise RuntimeError(
                f"reading {path_or_json!r} requires fsspec (plus the scheme's "
                "driver, e.g. gcsfs for gs://); install it or pass a local path"
            ) from e
        with fsspec.open(path_or_json, "r") as f:
            raw = json.load(f)
    else:
        with open(path_or_json) as f:
            raw = json.load(f)
    return [DLPProperties.from_dict(d) for d in raw]


@dataclass(frozen=True)
class ImportJobOptions:
    """DBImportPipelineOptions parity (common/DBImportPipelineOptions.java:22-53)."""

    jdbc_spec: str  # connection url, "mock://" sentinel, or a parquet dir
    dataset: str  # output dataset (a directory in the local warehouse)
    offset_count: int = 500  # rows per scan split (README.md:99-104)
    excluded_tables: str | None = None  # "a-b-c" spec
    dlp_config: str | None = None  # path to config JSON
    type_mode: str = "fidelity"  # or "compat" (SURVEY.md §7.4.2)
    warehouse_dir: str = "/tmp/dlp_rdb_bq_import_spark_warehouse"
    max_parallel_tables: int = 8
    # Row-level failed-insert capture (DBImportPipeline.java:134-146):
    # rows that would be rejected by the destination schema are
    # quarantined individually instead of failing the table's write.
    row_quarantine: bool = True
    write_retries: int = 2  # transient-retry parity (DBImportPipeline.java:130-132)


@dataclass(frozen=True)
class ReidJobOptions:
    """BQReIdentificationPipelineOptions parity
    (common/BQReIdentificationPipelineOptions.java:7-40)."""

    query: str
    deid_template: str | None = None
    insp_template: str | None = None
    column_map: dict[str, str] = field(default_factory=dict)  # bq name → original
    output_dir: str | None = None  # message sink directory (Pub/Sub stand-in)
