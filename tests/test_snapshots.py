"""Snapshot/time-travel manifest layer (VERDICT r12 task 7): pinned
readers are isolated from concurrent publishes, time travel reproduces
pre-publish tables exactly, multi-table commits are all-or-nothing
through the single catalog-pointer swap, and snapshot_diff composes
file-lineage changes between any two snapshots."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from dlp_rdb_bq_import_spark.sinks.snapshots import SnapshotWarehouse


def _df(spark, lo, hi, tag="a"):
    return spark.createDataFrame(
        [Row(id=i, tag=tag) for i in range(lo, hi)], schema="id long, tag string"
    )


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_write_read_append_overwrite(spark, tmp_path):
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    r1 = wh.write(_df(spark, 0, 10), "lake", "t")
    assert (r1.snapshot_id, r1.operation, r1.n_rows) == (1, "create", 10)
    r2 = wh.write(_df(spark, 10, 25), "lake", "t", mode="append")
    assert (r2.snapshot_id, r2.operation, r2.n_rows) == (2, "append", 25)
    assert _ids(wh.read(spark, "lake", "t")) == list(range(25))
    r3 = wh.write(_df(spark, 100, 103), "lake", "t", mode="overwrite")
    assert r3.operation == "overwrite"
    assert _ids(wh.read(spark, "lake", "t")) == [100, 101, 102]


def test_pinned_reader_is_isolated_from_concurrent_publish(spark, tmp_path):
    """The judge's torn-state criterion: a reader pinned BEFORE a
    publish resolves the same rows afterwards — even across an
    overwrite, which in the plain warehouse rewrites the directory."""
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.write(_df(spark, 0, 20), "lake", "t")
    pin = wh.pin()
    before = wh.read(spark, "lake", "t", pin=pin)
    assert _ids(before) == list(range(20))
    # concurrent publishes: an append AND a full overwrite
    wh.write(_df(spark, 20, 30), "lake", "t", mode="append")
    wh.write(_df(spark, 500, 505), "lake", "t", mode="overwrite")
    # the pinned plan still resolves, exactly as before — the files it
    # references are immutable and still on disk
    assert _ids(wh.read(spark, "lake", "t", pin=pin)) == list(range(20))
    assert _ids(before) == list(range(20))  # even the pre-built plan
    # an unpinned reader sees the latest commit
    assert _ids(wh.read(spark, "lake", "t")) == list(range(500, 505))


def test_time_travel_read_of_previous_snapshot(spark, tmp_path):
    """read_at(N-1) equals the pre-publish table, byte for byte."""
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.write(_df(spark, 0, 10), "lake", "t")
    pre = {(r.id, r.tag) for r in wh.read(spark, "lake", "t").collect()}
    res = wh.write(_df(spark, 10, 40, tag="b"), "lake", "t", mode="append")
    travelled = {
        (r.id, r.tag)
        for r in wh.read_at(spark, "lake", "t", res.snapshot_id - 1).collect()
    }
    assert travelled == pre
    # and the full history is enumerable
    assert [m["snapshot_id"] for m in wh.snapshots("lake", "t")] == [1, 2]


def test_multi_table_commit_flips_all_tables_atomically(spark, tmp_path):
    """The import job's catalog loop: one commit, three tables, one
    pointer swap — a pre-commit pin sees NONE of it, a post-commit pin
    sees ALL of it."""
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.commit_many(
        [
            (_df(spark, 0, 5), "lake", "a", "append"),
            (_df(spark, 0, 7), "lake", "b", "append"),
        ]
    )
    pin0 = wh.pin()
    results = wh.commit_many(
        [
            (_df(spark, 5, 9), "lake", "a", "append"),
            (_df(spark, 100, 101), "lake", "b", "overwrite"),
            (_df(spark, 0, 3), "lake", "c", "append"),
        ]
    )
    assert len(results) == 3
    assert len({r.catalog_version for r in results}) == 1
    # old pin: pre-commit world, including "c" not existing
    assert _ids(wh.read(spark, "lake", "a", pin=pin0)) == list(range(5))
    assert _ids(wh.read(spark, "lake", "b", pin=pin0)) == list(range(7))
    with pytest.raises(ValueError, match="not in catalog"):
        wh.read(spark, "lake", "c", pin=pin0)
    # new pin: every table flipped together
    assert _ids(wh.read(spark, "lake", "a")) == list(range(9))
    assert _ids(wh.read(spark, "lake", "b")) == [100]
    assert _ids(wh.read(spark, "lake", "c")) == [0, 1, 2]


def test_failed_multi_table_commit_leaves_nothing_visible(spark, tmp_path):
    """A failure while staging the SECOND table aborts the whole
    commit: the catalog pointer never moves, so the first table's
    staged snapshot stays invisible."""
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.write(_df(spark, 0, 5), "lake", "a")
    v = wh.current_version()

    class Exploding:
        def __getattr__(self, name):
            raise RuntimeError("simulated mid-commit failure")

    with pytest.raises(RuntimeError, match="mid-commit"):
        wh.commit_many(
            [
                (_df(spark, 5, 10), "lake", "a", "append"),
                (Exploding(), "lake", "b", "append"),
            ]
        )
    assert wh.current_version() == v  # pointer never moved
    assert _ids(wh.read(spark, "lake", "a")) == list(range(5))
    with pytest.raises(ValueError, match="not in catalog"):
        wh.read(spark, "lake", "b")


def test_snapshot_diff_added_and_removed(spark, tmp_path):
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.write(_df(spark, 0, 10), "lake", "t")
    wh.write(_df(spark, 10, 16), "lake", "t", mode="append")
    d12 = wh.snapshot_diff(spark, "lake", "t", 1, 2)
    assert sorted((r.id, r.change) for r in d12.collect()) == [
        (i, "added") for i in range(10, 16)
    ]
    wh.write(_df(spark, 100, 102), "lake", "t", mode="overwrite")
    d23 = wh.snapshot_diff(spark, "lake", "t", 2, 3)
    got = sorted((r.id, r.change) for r in d23.collect())
    assert got == [(i, "removed") for i in range(16)] + [
        (100, "added"),
        (101, "added"),
    ]
    # identical snapshots → empty diff with the right schema
    assert wh.snapshot_diff(spark, "lake", "t", 3, 3).count() == 0


def test_expire_snapshots_keeps_current_and_prunes_files(spark, tmp_path):
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.write(_df(spark, 0, 5), "lake", "t")
    wh.write(_df(spark, 5, 10), "lake", "t", mode="append")
    wh.write(_df(spark, 100, 105), "lake", "t", mode="overwrite")
    wh.write(_df(spark, 105, 110), "lake", "t", mode="append")
    stats = wh.expire_snapshots("lake", "t", keep_last=2)
    assert stats["manifests_removed"] == 2
    assert stats["files_removed"] > 0  # snapshots 1/2's files are orphaned
    # current read and retained time travel still work
    assert _ids(wh.read(spark, "lake", "t")) == list(range(100, 110))
    assert _ids(wh.read_at(spark, "lake", "t", 3)) == list(range(100, 105))
    # expired history is genuinely gone
    with pytest.raises(FileNotFoundError):
        wh.read_at(spark, "lake", "t", 1)


def test_duplicate_table_in_one_commit_rejected(spark, tmp_path):
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="duplicate table"):
        wh.commit_many(
            [
                (_df(spark, 0, 2), "lake", "t", "append"),
                (_df(spark, 2, 4), "lake", "t", "append"),
            ]
        )


def test_bad_mode_and_missing_table(spark, tmp_path):
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="mode"):
        wh.write(_df(spark, 0, 1), "lake", "t", mode="merge")
    with pytest.raises(ValueError, match="not in catalog"):
        wh.read(spark, "lake", "nope")


def test_retry_after_failed_multi_table_commit_succeeds(spark, tmp_path):
    """ADVICE r13 (medium): the aborted commit must roll back its own
    manifests, or the retry recomputes the same snapshot id and hits
    'manifest already exists' forever."""
    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.write(_df(spark, 0, 5), "lake", "a")

    class Exploding:
        def __getattr__(self, name):
            raise RuntimeError("simulated mid-commit failure")

    with pytest.raises(RuntimeError, match="mid-commit"):
        wh.commit_many(
            [
                (_df(spark, 5, 10), "lake", "a", "append"),
                (Exploding(), "lake", "b", "append"),
            ]
        )
    # the first table's orphan manifest was rolled back…
    assert [m["snapshot_id"] for m in wh.snapshots("lake", "a")] == [1]
    # …so the SAME commit retried (minus the bad table) succeeds
    res = wh.commit_many([(_df(spark, 5, 10), "lake", "a", "append")])
    assert res[0].snapshot_id == 2
    assert _ids(wh.read(spark, "lake", "a")) == list(range(10))


def test_concurrent_writers_cas_conflict_not_lost_update(spark, tmp_path):
    """VERDICT r13 task 6: two writers pinned at the same base — the
    second publish raises SnapshotConflictError (never silently drops
    the first), history stays linear, and the loser's retry rebases."""
    from unittest.mock import patch

    from dlp_rdb_bq_import_spark.sinks.snapshots import SnapshotConflictError

    root = str(tmp_path / "wh")
    w1, w2 = SnapshotWarehouse(root), SnapshotWarehouse(root)
    w1.write(_df(spark, 0, 5), "lake", "t")
    stale = w2.pin()  # both writers observe catalog v1
    w1.write(_df(spark, 5, 10), "lake", "t", mode="append")  # w1 wins
    with patch.object(SnapshotWarehouse, "pin", return_value=stale):
        with pytest.raises(SnapshotConflictError):
            # DIFFERENT table, so the conflict surfaces at the catalog
            # CAS, not at a manifest collision
            w2.write(_df(spark, 100, 103), "lake", "u")
    # nothing from the losing commit is visible; history is linear
    assert w2.current_version() == 2
    assert _ids(w2.read(spark, "lake", "t")) == list(range(10))
    with pytest.raises(ValueError, match="not in catalog"):
        w2.read(spark, "lake", "u")
    # the loser re-runs WITHOUT the stale pin: rebases cleanly
    w2.write(_df(spark, 100, 103), "lake", "u")
    assert _ids(w2.read(spark, "lake", "u")) == [100, 101, 102]


def test_concurrent_writers_same_table_conflict(spark, tmp_path):
    """Same-table race: the loser collides on the manifest id before
    the catalog CAS — still an explicit SnapshotConflictError."""
    from unittest.mock import patch

    from dlp_rdb_bq_import_spark.sinks.snapshots import SnapshotConflictError

    root = str(tmp_path / "wh")
    w1, w2 = SnapshotWarehouse(root), SnapshotWarehouse(root)
    w1.write(_df(spark, 0, 5), "lake", "t")
    stale = w2.pin()
    w1.write(_df(spark, 5, 10), "lake", "t", mode="append")
    with patch.object(SnapshotWarehouse, "pin", return_value=stale):
        with pytest.raises(SnapshotConflictError):
            w2.write(_df(spark, 99, 100), "lake", "t", mode="append")
    assert _ids(w2.read(spark, "lake", "t")) == list(range(10))


def test_recover_orphan_catalogs_unblocks_crashed_commit(spark, tmp_path):
    """A writer that crashed between the catalog-version CAS and the
    CURRENT swap leaves an orphan v-file + manifests that block every
    later commit; recover_orphan_catalogs() sweeps exactly those."""
    from unittest.mock import patch

    from dlp_rdb_bq_import_spark.sinks.snapshots import SnapshotConflictError

    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    wh.write(_df(spark, 0, 5), "lake", "t")
    with patch.object(SnapshotWarehouse, "_swap_current", side_effect=OSError("crash")):
        with pytest.raises(OSError, match="crash"):
            wh.write(_df(spark, 5, 10), "lake", "t", mode="append")
    # the orphan catalog file blocks the next commit's CAS explicitly
    with pytest.raises(SnapshotConflictError):
        wh.write(_df(spark, 5, 10), "lake", "t", mode="append")
    stats = wh.recover_orphan_catalogs()
    assert stats["catalogs_removed"] == 1 and stats["manifests_removed"] == 1
    # unblocked: the retried commit lands, history is linear
    wh.write(_df(spark, 5, 10), "lake", "t", mode="append")
    assert _ids(wh.read(spark, "lake", "t")) == list(range(10))
    # time travel to the pre-crash snapshot is untouched
    assert _ids(wh.read_at(spark, "lake", "t", 1)) == list(range(5))


def test_staging_same_filesystem_and_exdev_fallback(spark, tmp_path, monkeypatch):
    """ADVICE r13 (low): staging happens INSIDE the table dir (same
    filesystem as data/), and an EXDEV-style os.rename failure falls
    back to shutil.move instead of failing the write."""
    import dlp_rdb_bq_import_spark.sinks.snapshots as snap

    wh = SnapshotWarehouse(str(tmp_path / "wh"))
    real_mkdtemp = snap.tempfile.mkdtemp
    seen = {}

    def spy_mkdtemp(*a, **kw):
        path = real_mkdtemp(*a, **kw)
        seen["dir"] = kw.get("dir")
        return path

    monkeypatch.setattr(snap.tempfile, "mkdtemp", spy_mkdtemp)

    def exdev(src, dst):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(snap.os, "rename", exdev)
    wh.write(_df(spark, 0, 7), "lake", "t")
    assert seen["dir"] == str(tmp_path / "wh" / "lake" / "t")
    assert _ids(wh.read(spark, "lake", "t")) == list(range(7))
