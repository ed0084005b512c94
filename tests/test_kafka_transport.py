"""Contract tests for the Kafka message-transport adapter (VERDICT r11
task 7): one shared contract suite parametrized over BOTH the built-in
file transports and ``KafkaTransport`` driving a file-backed fake
broker through the injectable producer seam — proving the
``MessageTransport`` ABC is a real adapter point, not a stand-in-only
shape. The fake broker persists every acked record to disk because
Spark executors run in separate Python worker processes: in-memory
state would be invisible to the test."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.sinks.kafka_transport import KafkaTransport
from dlp_rdb_bq_import_spark.sinks.messages import (
    DurableLogTransport,
    JsonDirTransport,
    publish,
    read_log,
)


def _make_fake_producer_cls():
    """Build the fake-producer class INSIDE a function so cloudpickle
    serializes it by value into executor task closures (a module-level
    test class pickles by reference, and the tests directory is not on
    the executor PYTHONPATH)."""
    import json as _json
    import os as _os
    import uuid as _uuid

    class _FakeKafkaProducer:
        """File-backed stand-in implementing the producer protocol the
        adapter targets (kafka-python's surface): ``send`` buffers,
        acks happen at ``flush``, ``close`` without flush drops the
        buffer — the semantics the abort contract depends on."""

        def __init__(self, broker_dir: str, fail_on_substring: str = ""):
            self.broker_dir = broker_dir
            self.fail_on_substring = fail_on_substring
            self.buffer = []
            _os.makedirs(broker_dir, exist_ok=True)

        def send(self, topic, value=None, key=None, headers=None):
            rec = {
                "topic": topic,
                "value": value.decode("utf-8"),
                "key": key.decode("utf-8") if key else None,
                "headers": {k: v.decode("utf-8") for k, v in (headers or [])},
            }
            if self.fail_on_substring and self.fail_on_substring in rec["value"]:
                raise RuntimeError(
                    f"broker rejected record: {rec['value'][:40]}"
                )
            self.buffer.append(rec)

            class _Future:  # resolved-at-flush future, like the real client
                def get(self, timeout=None):
                    return None

            return _Future()

        def flush(self):
            for rec in self.buffer:
                path = _os.path.join(
                    self.broker_dir, f"rec-{_uuid.uuid4().hex}.json"
                )
                with open(path, "w") as f:
                    _json.dump(rec, f)
            self.buffer = []

        def close(self):
            self.buffer = []  # unflushed records are DROPPED, not delivered

    return _FakeKafkaProducer


_FakeKafkaProducer = _make_fake_producer_cls()


def _broker_records(broker_dir: str) -> list[dict]:
    out = []
    for name in os.listdir(broker_dir):
        with open(os.path.join(broker_dir, name)) as f:
            out.append(json.load(f))
    return out


def _delivered(kind: str, target: str) -> list[str]:
    if kind == "kafka":
        return [r["value"] for r in _broker_records(target)]
    if kind == "durable":
        return [m for batch in read_log(target) for m in batch]
    return [
        line
        for name in sorted(os.listdir(target))
        for line in open(os.path.join(target, name)).read().splitlines()
    ]


def _factory(kind: str, target: str):
    if kind == "kafka":
        return lambda: KafkaTransport(
            "fake:9092",
            "events",
            producer_factory=lambda: _FakeKafkaProducer(target),
        )
    if kind == "durable":
        return lambda: DurableLogTransport(target)
    return lambda: JsonDirTransport(target)


@pytest.mark.parametrize("kind", ["jsondir", "durable", "kafka"])
def test_publish_contract_delivers_every_row_exactly_once(spark, tmp_path, kind):
    """The shared transport contract through the REAL executor path:
    every row's JSON arrives exactly once, whatever the wire."""
    target = str(tmp_path / kind)
    df = spark.createDataFrame(
        [Row(id=i, name=f"user_{i}") for i in range(200)]
    ).repartition(4)
    publish(df, _factory(kind, target), max_messages=30)
    got = sorted(_delivered(kind, target))
    assert len(got) == 200
    ids = sorted(json.loads(m)["id"] for m in got)
    assert ids == list(range(200))


def test_kafka_adapter_key_is_fence_and_seq_monotonic(spark, tmp_path):
    """The stable partition fence travels as the message KEY and the
    per-producer sequence as a header — the documented (key, seq)
    consumer-dedup contract for the at-least-once delivery mode."""
    broker = str(tmp_path / "broker")
    df = spark.createDataFrame(
        [Row(id=i) for i in range(60)]
    ).repartition(3)
    publish(df, _factory("kafka", broker), max_messages=10)
    recs = _broker_records(broker)
    assert len(recs) == 60
    assert all(r["topic"] == "events" for r in recs)
    by_key: dict[str, list[int]] = {}
    for r in recs:
        assert r["key"], "fence key missing"
        by_key.setdefault(r["key"], []).append(int(r["headers"]["seq"]))
    assert len(by_key) == 3  # one producer fence per partition
    for seqs in by_key.values():
        assert sorted(seqs) == list(range(len(seqs)))  # gap-free per producer


def test_kafka_abort_drops_unflushed_buffer(tmp_path):
    """Failure path without Spark: a batch the broker rejects leaves
    previously-acked batches delivered (at-least-once, as documented)
    but abort() must DROP the failed producer's unflushed buffer —
    nothing publishes on teardown."""
    broker = str(tmp_path / "broker")
    t = KafkaTransport(
        "fake:9092",
        "events",
        producer_factory=lambda: _FakeKafkaProducer(
            broker, fail_on_substring="poison"
        ),
    )
    t.bind_task("run-p00001")
    t.open()
    t.send_batch(['{"id": 1}', '{"id": 2}'])
    with pytest.raises(RuntimeError, match="broker rejected"):
        t.send_batch(['{"id": "poison"}'])
    t.abort()
    vals = sorted(r["value"] for r in _broker_records(broker))
    assert vals == ['{"id": 1}', '{"id": 2}']  # acked batch only; no tail


def test_kafka_send_before_open_and_bad_topic():
    with pytest.raises(ValueError, match="topic"):
        KafkaTransport("fake:9092", "")
    t = KafkaTransport("fake:9092", "events", producer_factory=lambda: None)
    with pytest.raises(RuntimeError, match="before open"):
        t.send_batch(["x"])


def test_kafka_import_guard_message():
    """Without an injected producer, open() must fail with an
    actionable ImportError naming the public client package (the
    container ships no Kafka client — the guard IS the contract)."""
    try:
        import kafka  # noqa: F401

        pytest.skip("kafka-python unexpectedly present")
    except ImportError:
        pass
    t = KafkaTransport("fake:9092", "events")
    with pytest.raises(ImportError, match="kafka-python"):
        t.open()
