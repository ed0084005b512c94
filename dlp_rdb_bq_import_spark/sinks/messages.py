"""Batched message sink — the Pub/Sub publisher stand-in (S10).

Parity with BQReidentificationPipeline.java:124-129: each row published
as a JSON message, batched at ≤1000 messages / ≤10,000 bytes
(constants at :70-72). The producer lifecycle (open per partition,
flush on thresholds, final flush, close) runs executor-side inside
``foreachPartition`` with no driver collect — exactly a real
Pub/Sub/Kafka producer's shape.

The wire protocol is pluggable: ``publish`` takes a zero-arg
TRANSPORT FACTORY (must be picklable — it is constructed once per
partition on the executor), so a Kafka/Pub/Sub adapter is one class
implementing ``send_batch`` against its client library. With no
broker in this environment the default ``JsonDirTransport`` writes
one file per flushed batch; batching semantics are transport-
independent and unit-tested in-process via ``iter_batches``.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

from ..config import MESSAGE_BATCH_MAX_BYTES, MESSAGE_BATCH_MAX_MESSAGES
from ..functions.rowshape import rows_as_json


def iter_batches(
    messages: Iterable[str],
    max_messages: int = MESSAGE_BATCH_MAX_MESSAGES,
    max_bytes: int = MESSAGE_BATCH_MAX_BYTES,
) -> Iterator[list[str]]:
    """Split a message stream into publish batches, preserving order:
    a batch flushes when adding the next message would exceed either
    the message-count or byte cap (an oversized single message still
    ships alone — the reference's publisher has the same behavior:
    limits bound the BATCH, they do not drop data)."""
    batch: list[str] = []
    batch_bytes = 0
    for m in messages:
        size = len(m.encode("utf-8"))
        if batch and (len(batch) >= max_messages or batch_bytes + size > max_bytes):
            yield batch
            batch, batch_bytes = [], 0
        batch.append(m)
        batch_bytes += size
    if batch:
        yield batch


class MessageTransport:
    """Per-partition producer: ``open`` → ``send_batch``× → ``close``.

    Implementations must be constructible executor-side (the factory
    passed to ``publish`` is pickled into the task closure). Adapters
    for a real broker put client construction in ``open`` and
    producer.flush in ``close``.
    """

    def open(self) -> None:  # pragma: no cover - trivial default
        pass

    def send_batch(self, messages: list[str]) -> None:
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - trivial default
        pass


class JsonDirTransport(MessageTransport):
    """Default broker-less transport: one ``batch-*.jsonl`` file per
    flushed batch (file count == batch count, so the batch limits stay
    observable downstream)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir

    def open(self) -> None:
        os.makedirs(self.output_dir, exist_ok=True)

    def send_batch(self, messages: list[str]) -> None:
        path = os.path.join(self.output_dir, f"batch-{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(messages) + "\n")


class DurableLogTransport(MessageTransport):
    """Durable file-backed message log — the broker-adapter seam made
    concrete with real delivery semantics rather than a plain file
    dump:

    - ATOMIC visibility: each batch writes to a ``.tmp`` name, fsyncs,
      then ``os.rename``s into place — a reader never observes a
      partial batch, and a task that dies mid-write leaves only an
      invisible temp file (mirroring a broker's unacked publish).
    - ORDERED, GAP-CHECKED replay: filenames carry (producer_id,
      sequence); ``read_log`` yields batches in per-producer sequence
      order and raises on a missing sequence number — a lost batch is
      a loud error, not silent data loss.
    - At-least-once overall: a retried Spark task re-publishes its
      partition under a NEW producer id (task retries are new
      producers, as with a real broker without transactions);
      downstream dedup is the consumer's job — the streaming surface's
      ``streaming_dedup_events`` is exactly that consumer.
    """

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.producer_id = uuid.uuid4().hex[:12]
        self.seq = 0

    def open(self) -> None:
        os.makedirs(self.output_dir, exist_ok=True)

    def send_batch(self, messages: list[str]) -> None:
        final = os.path.join(
            self.output_dir, f"log-{self.producer_id}-{self.seq:08d}.jsonl"
        )
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(messages) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        self.seq += 1


def read_log(output_dir: str) -> list[list[str]]:
    """Replay a :class:`DurableLogTransport` directory: batches in
    (producer, sequence) order, ignoring invisible ``.tmp`` leftovers,
    raising on a sequence gap (a lost batch must be loud)."""
    entries = []
    for name in os.listdir(output_dir):
        if not name.startswith("log-") or not name.endswith(".jsonl"):
            continue
        _, producer, seq = name[: -len(".jsonl")].split("-")
        entries.append((producer, int(seq), name))
    entries.sort()
    out: list[list[str]] = []
    last_seq: dict[str, int] = {}
    for producer, seq, name in entries:
        expect = last_seq.get(producer, -1) + 1
        if seq != expect:
            raise ValueError(
                f"message log gap: producer {producer} jumps from "
                f"{expect - 1} to {seq} ({name})"
            )
        last_seq[producer] = seq
        with open(os.path.join(output_dir, name)) as f:
            out.append(f.read().splitlines())
    return out


def publish(
    df: DataFrame,
    transport_factory: Callable[[], MessageTransport],
    max_messages: int = MESSAGE_BATCH_MAX_MESSAGES,
    max_bytes: int = MESSAGE_BATCH_MAX_BYTES,
) -> None:
    """Encode rows to JSON and publish through the transport in
    bounded batches, one producer per partition."""
    msgs = rows_as_json(df)

    def publish_partition(rows) -> None:
        transport = transport_factory()
        transport.open()
        try:
            for batch in iter_batches(
                (row["message"] for row in rows), max_messages, max_bytes
            ):
                transport.send_batch(batch)
        finally:
            transport.close()

    msgs.foreachPartition(publish_partition)


def publish_json(
    df: DataFrame,
    output_dir: str,
    max_messages: int = MESSAGE_BATCH_MAX_MESSAGES,
    max_bytes: int = MESSAGE_BATCH_MAX_BYTES,
) -> None:
    """Publish via the default JSON-directory transport."""
    publish(df, lambda: JsonDirTransport(output_dir), max_messages, max_bytes)
