"""Batched message sink — the Pub/Sub publisher stand-in (S10).

Parity with BQReidentificationPipeline.java:124-129: each row published
as a JSON message, batched at ≤1000 messages / ≤10,000 bytes
(constants at :70-72). With no broker in the environment, the sink
writes one file per flushed batch via ``foreachPartition`` — the
publisher lifecycle (open per partition, flush on thresholds, final
flush) is exactly what a real Pub/Sub/Kafka producer would do, and
runs executor-side with no driver collect.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

from ..config import MESSAGE_BATCH_MAX_BYTES, MESSAGE_BATCH_MAX_MESSAGES
from ..functions.rowshape import rows_as_json


def publish_json(
    df: DataFrame,
    output_dir: str,
    max_messages: int = MESSAGE_BATCH_MAX_MESSAGES,
    max_bytes: int = MESSAGE_BATCH_MAX_BYTES,
) -> None:
    """Encode rows to JSON and publish in bounded batches."""
    os.makedirs(output_dir, exist_ok=True)
    msgs = rows_as_json(df)

    def publish_partition(rows) -> None:
        batch: list[str] = []
        batch_bytes = 0

        def flush() -> None:
            nonlocal batch, batch_bytes
            if not batch:
                return
            path = os.path.join(output_dir, f"batch-{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as f:
                f.write("\n".join(batch) + "\n")
            batch, batch_bytes = [], 0

        for row in rows:
            m = row["message"]
            size = len(m.encode("utf-8"))
            if batch and (len(batch) >= max_messages or batch_bytes + size > max_bytes):
                flush()
            batch.append(m)
            batch_bytes += size
        flush()

    msgs.foreachPartition(publish_partition)
