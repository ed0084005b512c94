"""Contract tests for the Pub/Sub transport and BigQuery warehouse
adapters (VERDICT r12 task 6) — both import-guarded public-client
adapters driven entirely through injected fakes, so the suite is green
WITHOUT either google-cloud package installed (the kafka_transport
discipline: the seam is the contract, the wire is a deployment detail).
"""

from __future__ import annotations

import io
import json
import os
import uuid

import pytest
from pyspark.sql import Row

from dlp_rdb_bq_import_spark.sinks.bigquery_warehouse import (
    BigQueryWarehouse,
    TableNotFound,
)
from dlp_rdb_bq_import_spark.sinks.messages import publish
from dlp_rdb_bq_import_spark.sinks.pubsub_transport import PubSubTransport


# --------------------------------------------------------------- pub/sub


def _make_fake_publisher_cls():
    """File-backed fake implementing the publisher protocol the adapter
    targets (google-cloud-pubsub's surface): ``publish`` hands the
    message to a background batcher (here: a buffer), futures resolve
    at ``result()``, ``stop()`` flushes. Built inside a function so
    cloudpickle serializes it by value into executor closures."""
    import json as _json
    import os as _os
    import uuid as _uuid

    class _FakePublisher:
        def __init__(self, broker_dir: str, fail_on_substring: str = ""):
            self.broker_dir = broker_dir
            self.fail_on = fail_on_substring
            self.buffer = []
            _os.makedirs(broker_dir, exist_ok=True)

        def publish(self, topic, data=b"", **attrs):
            rec = {
                "topic": topic,
                "data": data.decode("utf-8"),
                "attrs": dict(attrs),
            }
            buf, broker, fail_on = self.buffer, self.broker_dir, self.fail_on

            class _Future:
                def __init__(self):
                    self.sent = False
                    self.cancelled = False

                def result(self, timeout=None):
                    if fail_on and fail_on in rec["data"]:
                        raise RuntimeError(f"publish rejected: {rec['data'][:40]}")
                    if not self.cancelled and not self.sent:
                        path = _os.path.join(
                            broker, f"msg-{_uuid.uuid4().hex}.json"
                        )
                        with open(path, "w") as f:
                            _json.dump(rec, f)
                        self.sent = True
                    return f"id-{_uuid.uuid4().hex[:8]}"

                def cancel(self):
                    if not self.sent:
                        self.cancelled = True

            fut = _Future()
            buf.append(fut)
            return fut

        def stop(self):
            for f in self.buffer:
                f.result()
            self.buffer = []

    return _FakePublisher


_FakePublisher = _make_fake_publisher_cls()


def _broker_msgs(broker_dir):
    out = []
    for name in os.listdir(broker_dir):
        with open(os.path.join(broker_dir, name)) as f:
            out.append(json.load(f))
    return out


def test_pubsub_publish_contract_exactly_once(spark, tmp_path):
    """Every row's JSON arrives exactly once through the REAL
    foreachPartition executor path, with fence+seq attributes."""
    broker = str(tmp_path / "broker")
    df = spark.createDataFrame(
        [Row(id=i, name=f"user_{i}") for i in range(200)]
    ).repartition(4)
    publish(
        df,
        lambda: PubSubTransport(
            "proj", "events", publisher_factory=lambda: _FakePublisher(broker)
        ),
        max_messages=30,
    )
    msgs = _broker_msgs(broker)
    assert len(msgs) == 200
    ids = sorted(json.loads(m["data"])["id"] for m in msgs)
    assert ids == list(range(200))
    assert all(m["topic"] == "projects/proj/topics/events" for m in msgs)
    # fence identifies the partition; seq is monotonic within a fence
    by_fence: dict = {}
    for m in msgs:
        by_fence.setdefault(m["attrs"]["fence"], []).append(int(m["attrs"]["seq"]))
    assert len(by_fence) == 4
    for seqs in by_fence.values():
        assert sorted(seqs) == list(range(len(seqs)))


def test_pubsub_batch_error_surfaces_in_batch(tmp_path):
    """A rejected message fails send_batch NOW — inside the attempt."""
    broker = str(tmp_path / "b2")
    tr = PubSubTransport(
        "p", "t", publisher_factory=lambda: _FakePublisher(broker, "poison")
    )
    tr.open()
    tr.bind_task("f1")
    tr.send_batch(['{"ok": 1}'])
    with pytest.raises(RuntimeError, match="rejected"):
        tr.send_batch(['{"x": "poison"}'])


def test_pubsub_abort_cancels_unsent_and_never_stops(tmp_path):
    """abort() cancels pending futures and does NOT call stop() (which
    would flush — the failed partition must not keep publishing)."""
    broker = str(tmp_path / "b3")
    pub = _FakePublisher(broker)
    tr = PubSubTransport("p", "t", publisher_factory=lambda: pub)
    tr.open()
    # queue a message without resolving (simulate a mid-batch failure)
    fut = pub.publish(tr.topic_path, data=b"pending")
    tr._pending = [fut]
    tr.abort()
    assert fut.cancelled and not fut.sent
    pub.stop()  # even a later broker flush must not deliver it
    assert _broker_msgs(broker) == []


def test_pubsub_close_flushes_via_stop(tmp_path):
    broker = str(tmp_path / "b4")
    pub = _FakePublisher(broker)
    tr = PubSubTransport("p", "t", publisher_factory=lambda: pub)
    tr.open()
    pub.publish(tr.topic_path, data=b"buffered")  # unsent until stop
    tr.close()
    assert len(_broker_msgs(broker)) == 1


def test_pubsub_guards():
    with pytest.raises(ValueError):
        PubSubTransport("", "t")
    tr = PubSubTransport("p", "t", publisher_factory=lambda: None)
    with pytest.raises(RuntimeError, match="before open"):
        tr.send_batch(["x"])


def test_pubsub_import_guard_message():
    tr = PubSubTransport("p", "t")  # no factory → real client path
    with pytest.raises(ImportError, match="google-cloud-pubsub"):
        tr.open()


# -------------------------------------------------------------- bigquery


class _FakeJob:
    def __init__(self, fn):
        self._fn = fn

    def result(self, timeout=None):
        return self._fn()


class _FakeBQClient:
    """In-memory BigQuery standing in for the adapter's client
    protocol: tables are pyarrow Tables keyed by qualified name;
    load/copy are jobs whose effects apply at result() (load errors
    therefore surface inside the attempt, like the real client)."""

    def __init__(self, fail_loads: int = 0, fail_staging_delete: bool = False):
        self.tables: dict = {}
        self.datasets: set = set()
        self.fail_loads = fail_loads
        self.fail_staging_delete = fail_staging_delete
        self.deleted: list = []

    def create_dataset(self, name, exists_ok=False):
        if name in self.datasets and not exists_ok:
            raise RuntimeError(f"dataset {name} exists")
        self.datasets.add(name)

    def get_table(self, name):
        if name not in self.tables:
            raise TableNotFound(name)
        return object()

    def load_table_from_file(self, fh, table, job_config=None):
        import pyarrow.parquet as pq

        data = fh.read()

        def _apply():
            if self.fail_loads > 0:
                self.fail_loads -= 1
                raise RuntimeError("simulated load-job failure")
            t = pq.read_table(io.BytesIO(data))
            prev = self.tables.get(table)
            if prev is not None:
                import pyarrow as pa

                t2 = pa.concat_tables([prev, t.select(prev.column_names)])
            else:
                t2 = t
            self.tables[table] = t2

        return _FakeJob(_apply)

    def copy_table(self, src, dst, job_config=None):
        mode = (job_config or {}).get("mode", "append")

        def _apply():
            t = self.tables[src]
            prev = self.tables.get(dst)
            if mode == "append" and prev is not None:
                import pyarrow as pa

                self.tables[dst] = pa.concat_tables(
                    [prev, t.select(prev.column_names)]
                )
            else:
                self.tables[dst] = t

        return _FakeJob(_apply)

    def delete_table(self, name, not_found_ok=False):
        if self.fail_staging_delete and "_stg" in name:
            raise RuntimeError("simulated delete failure")
        if name not in self.tables:
            if not_found_ok:
                return
            raise TableNotFound(name)
        self.deleted.append(name)
        del self.tables[name]

    def list_rows(self, name):
        t = self.tables[name]

        class _Rows:
            def to_arrow(self):
                return t

        return _Rows()


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [Row(id=i, name=f"row_{i}") for i in range(lo, hi)],
        schema="id long, name string",
    )


def _ids(wh, spark, ds, tbl):
    return sorted(r.id for r in wh.read(spark, ds, tbl).collect())


def test_bq_create_on_demand_and_readback(spark):
    cl = _FakeBQClient()
    wh = BigQueryWarehouse("proj", client_factory=lambda: cl)
    res = wh.write(_df(spark, 0, 25), "lake", "orders_a")
    assert res.status == "ok" and res.attempts == 1
    assert wh.table_exists(spark, "lake", "orders_a")
    assert _ids(wh, spark, "lake", "orders_a") == list(range(25))
    # staging cleaned up
    assert not [t for t in cl.tables if "_stg" in t]


def test_bq_append_accumulates_exactly(spark):
    cl = _FakeBQClient()
    wh = BigQueryWarehouse("proj", client_factory=lambda: cl)
    wh.write(_df(spark, 0, 10), "lake", "orders_b")
    wh.write(_df(spark, 10, 30), "lake", "orders_b", mode="append")
    assert _ids(wh, spark, "lake", "orders_b") == list(range(30))


def test_bq_overwrite_replaces(spark):
    cl = _FakeBQClient()
    wh = BigQueryWarehouse("proj", client_factory=lambda: cl)
    wh.write(_df(spark, 0, 10), "lake", "orders_c")
    wh.write(_df(spark, 100, 105), "lake", "orders_c", mode="overwrite")
    assert _ids(wh, spark, "lake", "orders_c") == list(range(100, 105))


def test_bq_flaky_load_retries_without_double_append(spark):
    """First load job dies; the retry's fresh staging must land exactly
    one copy in the destination."""
    cl = _FakeBQClient()
    wh = BigQueryWarehouse("proj", client_factory=lambda: cl)
    wh.write(_df(spark, 0, 5), "lake", "orders_d")
    cl.fail_loads = 1  # next load job (first of the append) dies
    res = wh.write(_df(spark, 5, 12), "lake", "orders_d", mode="append")
    assert res.status == "ok" and res.attempts == 2
    assert _ids(wh, spark, "lake", "orders_d") == list(range(12))


def test_bq_failed_staging_delete_after_copy_is_ok(spark):
    """The copy committed; a failed staging DELETE must not re-enter
    the retry loop (the jdbc_warehouse double-append guard)."""
    cl = _FakeBQClient(fail_staging_delete=True)
    wh = BigQueryWarehouse("proj", client_factory=lambda: cl)
    wh.write(_df(spark, 0, 7), "lake", "orders_e")
    res = wh.write(_df(spark, 0, 7), "lake", "orders_e", mode="append")
    assert res.status == "ok" and res.attempts == 1
    assert _ids(wh, spark, "lake", "orders_e") == sorted(list(range(7)) * 2)


def test_bq_exhausted_retries_dead_letter(spark):
    cl = _FakeBQClient(fail_loads=99)
    wh = BigQueryWarehouse("proj", client_factory=lambda: cl)
    res = wh.write(_df(spark, 0, 5), "lake", "orders_f", max_retries=2)
    assert res.status == "failed" and res.attempts == 3
    assert "load-job failure" in res.error
    assert not wh.table_exists(spark, "lake", "orders_f")


def test_bq_guards(spark):
    with pytest.raises(ValueError):
        BigQueryWarehouse("")
    wh = BigQueryWarehouse("proj", client_factory=lambda: _FakeBQClient())
    with pytest.raises(ValueError):
        wh.write(_df(spark, 0, 1), "lake", "t", mode="merge")


def test_bq_import_guard_message(spark):
    wh = BigQueryWarehouse("proj")  # no factory → real client path
    with pytest.raises(ImportError, match="google-cloud-bigquery"):
        wh.table_exists(spark, "lake", "t")
