"""CDC/merge semantics: latest-wins ordering, delete precedence, and
the no-shuffle-of-base plan shape for broadcast-sized change batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from dlp_rdb_bq_import_spark.operators.cdc import apply_changes, merge_upsert


def test_merge_upsert_update_and_insert(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    got = {(r["k"], r["v"]) for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_apply_changes_latest_wins_and_delete(spark):
    base = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    changes = spark.createDataFrame(
        [
            (1, 11, "upsert", 1),   # stale — superseded by seq 2
            (1, 12, "upsert", 2),   # latest for key 1
            (2, 0, "delete", 1),    # key 2 removed
            (4, 40, "upsert", 1),   # brand-new key
        ],
        "k long, v long, _op string, _seq long",
    )
    got = {(r["k"], r["v"]) for r in apply_changes(base, changes, ["k"]).collect()}
    assert got == {(1, 12), (3, 30), (4, 40)}


def test_apply_changes_delete_beats_same_seq_upsert(spark):
    base = spark.createDataFrame([(1, 10)], "k long, v long")
    changes = spark.createDataFrame(
        [(1, 99, "upsert", 5), (1, 0, "delete", 5)],
        "k long, v long, _op string, _seq long",
    )
    assert apply_changes(base, changes, ["k"]).count() == 0


def test_merge_upsert_base_does_not_shuffle(spark):
    """With a broadcast change batch the base side must join without an
    exchange — the property that lets MERGE scale to a 100 TB base."""
    base = spark.range(0, 10_000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    updates = spark.createDataFrame([(1, "y")], "k long, v string")
    merged = merge_upsert(base, updates, ["k"], broadcast_updates=True)
    merged.collect()
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan


def test_merge_upsert_default_no_forced_broadcast(spark):
    """Default path must not force a broadcast of the change batch: the
    logical plan carries no broadcast hint, so an arbitrarily large CDC
    batch cannot hit the broadcast size limit / driver OOM (AQE may
    still choose broadcast at runtime for small sides)."""
    base = spark.createDataFrame([(1, "x"), (2, "x")], "k long, v string")
    updates = spark.createDataFrame([(1, "y")], "k long, v string")
    merged = merge_upsert(base, updates, ["k"])
    assert "UnresolvedHint" not in merged._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in merged._jdf.queryExecution().analyzed().toString()
    got = {(r["k"], r["v"]) for r in merged.collect()}
    assert got == {(1, "y"), (2, "x")}


def test_scd2_build_histories(spark):
    from dlp_rdb_bq_import_spark.operators.cdc import scd2_build

    # key 1: create->reprice->delete->recreate; key 2: create only
    ch = spark.createDataFrame(
        [
            (1, 10.0, "upsert", 0),
            (1, 20.0, "upsert", 5),
            (1, None, "delete", 8),
            (1, 30.0, "upsert", 12),
            (2, 99.0, "upsert", 3),
        ],
        "k long, price double, _op string, _seq long",
    )
    rows = {
        (r.k, r.valid_from): (r.price, r.valid_to, r.is_current)
        for r in scd2_build(ch, ["k"]).collect()
    }
    assert rows[(1, 0)] == (10.0, 5, False)
    assert rows[(1, 5)] == (20.0, 8, False)   # closed by the delete
    assert rows[(1, 12)] == (30.0, None, True)
    assert rows[(2, 3)] == (99.0, None, True)
    assert len(rows) == 4  # the delete contributes no version row


def test_scd2_lookup_gap_and_prehistory(spark):
    from dlp_rdb_bq_import_spark.operators.cdc import scd2_build, scd2_lookup

    ch = spark.createDataFrame(
        [
            (1, 10.0, "upsert", 0),
            (1, None, "delete", 8),
            (1, 30.0, "upsert", 12),
        ],
        "k long, price double, _op string, _seq long",
    )
    versions = scd2_build(ch, ["k"])
    facts = spark.createDataFrame(
        [(100, 1, 4), (101, 1, 9), (102, 1, 12), (103, 1, 50), (104, 7, 5)],
        "fid long, k long, at long",
    )
    got = {r.fid: (r.price, r.valid_from) for r in
           scd2_lookup(facts, versions, on="k", fact_seq_col="at").collect()}
    assert got[100] == (10.0, 0)        # inside first version
    assert got[101] == (None, None)     # in the delete gap
    assert got[102] == (30.0, 12)       # boundary: valid_from inclusive
    assert got[103] == (30.0, 12)       # open-ended current version
    assert got[104] == (None, None)     # unknown key preserved (left)


def test_scd2_lookup_rejects_column_collisions(spark):
    from dlp_rdb_bq_import_spark.operators.cdc import scd2_build, scd2_lookup

    ch = spark.createDataFrame(
        [(1, 10.0, "upsert", 0)], "k long, price double, _op string, _seq long"
    )
    versions = scd2_build(ch, ["k"])
    facts = spark.createDataFrame([(1, 1, 5.0)], "fid long, k long, price double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision"):
        scd2_lookup(facts, versions, on="k", fact_seq_col="fid")


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

from dlp_rdb_bq_import_spark.operators.cdc import snapshot_diff  # noqa: E402


def test_snapshot_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, 30.0, "z")], "k long, v double, s string"
    )
    new = spark.createDataFrame(
        [(2, 20.0, "y"), (3, 31.0, "z"), (4, 40.0, "w")], "k long, v double, s string"
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()}
    assert out[1]["change_type"] == "removed" and out[1]["new_v"] is None
    assert 2 not in out  # unchanged pruned by default
    assert out[3]["change_type"] == "changed"
    assert (out[3]["old_v"], out[3]["new_v"]) == (30.0, 31.0)
    assert out[4]["change_type"] == "added" and out[4]["old_v"] is None


def test_snapshot_diff_null_values_null_safe(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v double")
    new = spark.createDataFrame([(1, None), (2, 5.0)], "k long, v double")
    out = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, ["k"], ["v"],
                                  include_unchanged=True).collect()}
    assert out[1] == "unchanged"  # NULL vs NULL is not a change
    assert out[2] == "changed"   # NULL vs value is


def test_snapshot_diff_reserved_guard(spark):
    df = spark.createDataFrame([(1, "a")], "k long, change_type string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="reserved"):
        snapshot_diff(df, df, ["k"], ["change_type"])
