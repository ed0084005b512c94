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
import re
import uuid
from typing import Callable, Iterable, Iterator

from pyspark import TaskContext
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

    def bind_task(self, fence: str) -> None:  # pragma: no cover - trivial default
        """Called by :func:`publish` before ``open`` with a STABLE
        partition identity (same string for every attempt of the same
        partition of the same publish call — speculative duplicates
        and stage-resubmission retries included). A transactional
        transport uses it to fence duplicate successful attempts so a
        partition commits at most once; the default ignores it."""
        pass

    def open(self) -> None:  # pragma: no cover - trivial default
        pass

    def send_batch(self, messages: list[str]) -> None:
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - trivial default
        """Successful-completion hook: flush/commit. Called only when
        every batch of the partition published without error."""
        pass

    def abort(self) -> None:  # pragma: no cover - trivial default
        """Failure hook: release resources WITHOUT committing (a
        transactional transport must not publish its commit marker
        here — an aborted producer's batches are never delivered)."""
        pass


def _require_line_framed(messages: list[str]) -> None:
    """Both file transports frame one message per line, so a message
    containing an embedded newline would silently change message
    boundaries on replay (["one\\ntwo"] would read back as two
    messages). The JSON publish path can never produce one, but these
    transports are public — fail loudly rather than corrupt."""
    for m in messages:
        if "\n" in m:
            raise ValueError(
                "line-framed transport cannot ship a message containing "
                f"an embedded newline: {m[:80]!r}"
            )


class JsonDirTransport(MessageTransport):
    """Default broker-less transport: one ``batch-*.jsonl`` file per
    flushed batch (file count == batch count, so the batch limits stay
    observable downstream)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir

    def open(self) -> None:
        os.makedirs(self.output_dir, exist_ok=True)

    def send_batch(self, messages: list[str]) -> None:
        _require_line_framed(messages)
        path = os.path.join(self.output_dir, f"batch-{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(messages) + "\n")


class DurableLogTransport(MessageTransport):
    """Durable file-backed message log — the broker-adapter seam made
    concrete with TRANSACTIONAL-producer delivery semantics rather
    than a plain file dump:

    - ATOMIC visibility: each batch writes to a ``.tmp`` name, fsyncs,
      renames into place, and fsyncs the DIRECTORY — a reader never
      observes a partial batch, and the rename itself survives power
      loss (contents-only fsync leaves the directory entry
      unjournaled).
    - COMMITTED producers only: ``close`` publishes a commit marker
      recording the producer id and its batch count. ``read_log``
      delivers a producer's batches only when its marker is present
      AND every sequence 0..n-1 exists — a mid-stream gap OR a lost
      tail batch is a loud error (a count-less gap check cannot see
      trailing truncation), and an uncommitted producer (crashed
      task) is skipped entirely, exactly a transactional broker's
      un-acked publish.
    - FENCED duplicate attempts: each attempt writes batches under its
      own random producer id (concurrent attempts never clobber each
      other's files), but the commit marker is named by the STABLE
      partition fence from ``bind_task`` and created atomically with
      first-commit-wins semantics (``os.link`` of a private fsynced
      temp — an exclusive create that cannot expose a half-written
      marker). Under speculative execution or stage resubmission, two
      SUCCESSFUL attempts of the same partition race to one marker;
      the loser discards its batch files and its output is never
      delivered, so replay is exactly-once per partition. A transport
      constructed standalone (no ``bind_task``) fences on its own
      producer id, i.e. each instance is its own partition.
    """

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.producer_id = uuid.uuid4().hex[:12]
        self.fence = self.producer_id
        self.seq = 0

    def bind_task(self, fence: str) -> None:
        safe = re.sub(r"[^A-Za-z0-9._-]", "_", fence)
        if not safe:
            raise ValueError(f"unusable partition fence: {fence!r}")
        self.fence = safe

    def open(self) -> None:
        os.makedirs(self.output_dir, exist_ok=True)

    def _publish_file(self, final: str, body: str) -> None:
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        dfd = os.open(self.output_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)  # journal the directory entry, not just bytes
        finally:
            os.close(dfd)

    def send_batch(self, messages: list[str]) -> None:
        _require_line_framed(messages)
        self._publish_file(
            os.path.join(
                self.output_dir, f"log-{self.producer_id}-{self.seq:08d}.jsonl"
            ),
            "\n".join(messages) + "\n",
        )
        self.seq += 1

    def close(self) -> None:
        """Commit: atomically claim this partition's fence marker.
        First successful attempt wins; a duplicate successful attempt
        (speculation, stage retry) loses the ``os.link`` race, discards
        its own batch files, and leaves the winner's output as the one
        delivered copy."""
        final = os.path.join(self.output_dir, f"commit-{self.fence}")
        tmp = os.path.join(self.output_dir, f".commit-{self.producer_id}.tmp")
        with open(tmp, "w") as f:
            f.write(f"{self.producer_id} {self.seq}\n")
            f.flush()
            os.fsync(f.fileno())
        try:
            # hard-link = atomic create-if-absent of a fully-written,
            # fsynced marker: no reader can see a partial commit, and
            # exactly one attempt per fence can succeed
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            self._discard_own_batches()
            return
        os.unlink(tmp)
        dfd = os.open(self.output_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def abort(self) -> None:
        self._discard_own_batches()

    def _discard_own_batches(self) -> None:
        """Best-effort removal of this producer's uncommitted batch
        files (they are invisible to ``read_log`` either way — this
        just reclaims the space of a losing/aborted attempt)."""
        for seq in range(self.seq):
            try:
                os.unlink(
                    os.path.join(
                        self.output_dir, f"log-{self.producer_id}-{seq:08d}.jsonl"
                    )
                )
            except OSError:  # pragma: no cover - best-effort cleanup
                pass


_LOG_NAME = re.compile(r"^log-([0-9a-f]+)-(\d{8})\.jsonl$")
_COMMIT_NAME = re.compile(r"^commit-([A-Za-z0-9._-]+)$")


def read_log(output_dir: str) -> list[list[str]]:
    """Replay a :class:`DurableLogTransport` directory: batches of
    COMMITTED partitions in (fence, sequence) order. Each fence marker
    names the ONE producer attempt whose commit won — batches of
    losing or uncommitted attempts (speculative duplicates, crashed
    tasks) are skipped, so every partition is delivered exactly once.
    Invisible ``.tmp`` leftovers and foreign files are ignored; a
    committed producer missing ANY sequence — middle gap or lost
    tail — raises."""
    committed: dict[str, tuple[str, int]] = {}
    batches: dict[str, dict[int, str]] = {}
    for name in os.listdir(output_dir):
        if m := _COMMIT_NAME.match(name):
            with open(os.path.join(output_dir, name)) as f:
                parts = f.read().split()
            if len(parts) == 1:
                # pre-fence marker format: the commit file carried only
                # the batch count, and the fence WAS the producer id
                producer, n = m.group(1), parts[0]
            elif len(parts) == 2:
                producer, n = parts
            else:
                raise ValueError(
                    f"unrecognized commit marker {name!r}: expected "
                    f"'<count>' (legacy) or '<producer> <count>', got {parts!r}"
                )
            if not n.isdigit():
                raise ValueError(
                    f"unrecognized commit marker {name!r}: batch count "
                    f"{n!r} is not an integer"
                )
            committed[m.group(1)] = (producer, int(n))
        elif m := _LOG_NAME.match(name):
            batches.setdefault(m.group(1), {})[int(m.group(2))] = name
    out: list[list[str]] = []
    for fence in sorted(committed):
        producer, n = committed[fence]
        have = batches.get(producer, {})
        missing = [s for s in range(n) if s not in have]
        if missing:
            raise ValueError(
                f"message log loss: producer {producer} (fence {fence}) "
                f"committed {n} batches but sequences {missing[:5]} are absent"
            )
        for seq in range(n):
            with open(os.path.join(output_dir, have[seq])) as f:
                out.append(f.read().splitlines())
    return out


def publish(
    df: DataFrame,
    transport_factory: Callable[[], MessageTransport],
    max_messages: int = MESSAGE_BATCH_MAX_MESSAGES,
    max_bytes: int = MESSAGE_BATCH_MAX_BYTES,
) -> None:
    """Encode rows to JSON and publish through the transport in
    bounded batches, one producer per partition.

    Every attempt of a partition is handed the same fence string —
    ``run_token`` is drawn once on the driver and serialized into the
    task closure, so speculative duplicates and stage-resubmission
    retries all see it, while two distinct ``publish`` calls into the
    same transport target never collide."""
    msgs = rows_as_json(df)
    run_token = uuid.uuid4().hex[:12]

    def publish_partition(rows) -> None:
        transport = transport_factory()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        bind = getattr(transport, "bind_task", None)  # protocol is duck-typed
        if bind is not None:
            bind(f"{run_token}-p{pid:05d}")
        transport.open()
        try:
            for batch in iter_batches(
                (row["message"] for row in rows), max_messages, max_bytes
            ):
                transport.send_batch(batch)
        except BaseException:
            # a failed partition must NOT commit: close() is the
            # success/commit hook, abort() the resource-release one —
            # a transactional transport's uncommitted batches are
            # invisible to read_log, and Spark's task retry re-runs
            # the partition under a fresh producer
            transport.abort()
            raise
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
