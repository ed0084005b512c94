"""Live tests for the JDBC warehouse sink (S8 dynamic destinations
against a real SQL engine — in-process Apache Derby, the same public
driver the JDBC-source live tests use). Covers create-on-demand,
exactly-once append under retry, overwrite, failure dead-lettering,
and parquet-warehouse surface parity."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.sinks.jdbc_warehouse import JdbcWarehouse

URL = "jdbc:derby:memory:whtest;create=true"


@pytest.fixture(scope="module")
def wh(spark):
    # touching DriverManager once materializes the in-memory database
    spark._jvm.java.sql.DriverManager.getConnection(URL).close()
    return JdbcWarehouse(URL)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [Row(id=i, name=f"row_{i}") for i in range(lo, hi)],
        schema="id long, name string",
    )


def test_create_on_demand_write_and_readback(spark, wh):
    res = wh.write(_df(spark, 0, 25), "lake", "orders_a")
    assert res.status == "ok" and res.attempts == 1
    assert wh.table_exists(spark, "lake", "orders_a")
    got = sorted(r.id for r in wh.read(spark, "lake", "orders_a").collect())
    assert got == list(range(25))


def test_append_accumulates_exactly(spark, wh):
    wh.write(_df(spark, 0, 10), "lake", "orders_b")
    wh.write(_df(spark, 10, 30), "lake", "orders_b", mode="append")
    got = sorted(r.id for r in wh.read(spark, "lake", "orders_b").collect())
    assert got == list(range(30))  # no loss, no duplication


def test_overwrite_replaces(spark, wh):
    wh.write(_df(spark, 0, 10), "lake", "orders_c")
    wh.write(_df(spark, 100, 105), "lake", "orders_c", mode="overwrite")
    got = sorted(r.id for r in wh.read(spark, "lake", "orders_c").collect())
    assert got == list(range(100, 105))


def test_flaky_attempt_retries_without_double_append(spark, wh):
    """First attempt dies AFTER staging rows; the retry must leave the
    destination with exactly one copy — the staged-atomic contract."""
    wh.write(_df(spark, 0, 5), "lake", "orders_d")

    class Flaky(JdbcWarehouse):
        def __init__(self, url):
            super().__init__(url)
            self.calls = 0

        def _write_attempt(self, df, staging):
            super()._write_attempt(df, staging)
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("transient: connection reset")

    flaky = Flaky(URL)
    res = flaky.write(_df(spark, 5, 12), "lake", "orders_d", mode="append")
    assert res.status == "ok" and res.attempts == 2
    got = sorted(r.id for r in wh.read(spark, "lake", "orders_d").collect())
    assert got == list(range(12))


def test_exhausted_retries_dead_letter_leave_destination_intact(spark, wh):
    wh.write(_df(spark, 0, 7), "lake", "orders_e")

    class Dead(JdbcWarehouse):
        def _write_attempt(self, df, staging):
            raise RuntimeError("permanently down")

    res = Dead(URL).write(
        _df(spark, 7, 9), "lake", "orders_e", mode="append", max_retries=1
    )
    assert res.status == "failed" and res.attempts == 2
    assert "permanently down" in res.error
    got = sorted(r.id for r in wh.read(spark, "lake", "orders_e").collect())
    assert got == list(range(7))  # untouched


def test_identifier_validation(spark, wh):
    with pytest.raises(ValueError, match="identifier"):
        wh.write(_df(spark, 0, 1), "lake", 'bad"; DROP TABLE x --')
    with pytest.raises(ValueError, match="identifier"):
        wh.qualified("1bad", "t")


def test_mode_validation(spark, wh):
    with pytest.raises(ValueError, match="mode"):
        wh.write(_df(spark, 0, 1), "lake", "t_mode", mode="merge")
