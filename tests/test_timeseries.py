"""Unit tests for operators/timeseries.py: planted-gap forward fill,
dense spine bounds, event-time cohort offsets, reserved-name guards,
and the no-cartesian plan property of the spine join."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.timeseries import (
    cohort_retention,
    resample_gapfill,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=T0 + dt.timedelta(seconds=s), value=float(v)) for u, s, v in rows]
    )


def test_gap_buckets_zero_filled_and_value_carried(spark):
    # user 1: events in hour 0 and hour 3 -> hours 1,2 are gaps
    ev = _ev(spark, [(1, 100, 10.0), (1, 200, 20.0), (1, 3 * 3600 + 5, 7.0)])
    out = resample_gapfill(
        ev, ts_col="ts", key_cols=["user_id"], value_col="value", grain_seconds=3600
    )
    rows = {r["bucket"]: r for r in out.collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0]["n_events"] == 2 and rows[0]["avg_value"] == 15.0
    for gap in (1, 2):
        assert rows[gap]["n_events"] == 0
        assert rows[gap]["avg_value"] is None
        assert rows[gap]["filled_value"] == 15.0  # carried forward
    assert rows[3]["filled_value"] == 7.0


def test_spine_is_per_key_not_global(spark):
    # user 2 is active only in hour 10; its spine must not stretch back
    # to user 1's hour 0.
    ev = _ev(spark, [(1, 0, 1.0), (2, 10 * 3600, 2.0)])
    out = resample_gapfill(
        ev, ts_col="ts", key_cols=["user_id"], value_col="value", grain_seconds=3600
    )
    got = {(r["user_id"], r["bucket"]) for r in out.collect()}
    assert got == {(1, 0), (2, 10)}


def test_pre_origin_timestamps_bucket_negative(spark):
    ev = _ev(spark, [(1, -3600, 5.0), (1, 0, 6.0)])
    out = resample_gapfill(
        ev, ts_col="ts", key_cols=["user_id"], value_col="value", grain_seconds=3600
    )
    assert sorted(r["bucket"] for r in out.collect()) == [-1, 0]


def test_resample_reserved_name_raises(spark):
    ev = _ev(spark, [(1, 0, 1.0)]).withColumnRenamed("value", "bucket")
    with pytest.raises(ValueError, match="reserved"):
        resample_gapfill(
            ev, ts_col="ts", key_cols=["user_id"], value_col="bucket", grain_seconds=3600
        )


def test_resample_plan_has_no_cartesian(spark):
    ev = _ev(spark, [(1, 0, 1.0), (2, 3600, 2.0)])
    out = resample_gapfill(
        ev, ts_col="ts", key_cols=["user_id"], value_col="value", grain_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_offset_is_event_time_not_calendar(spark):
    # first event on day 6 of week 0; return 6 days later (day 12,
    # calendar week 1) -> event-time offset is still 0.
    week = 7 * 86400
    ev = _ev(spark, [(1, 6 * 86400, 1.0), (1, 12 * 86400, 1.0)])
    out = cohort_retention(ev, user_col="user_id", ts_col="ts")
    rows = {(r["cohort"], r["week_offset"]): r["active_users"] for r in out.collect()}
    assert rows == {(0, 0): 1}
    # 8 days later -> offset 1
    ev2 = _ev(spark, [(1, 6 * 86400, 1.0), (1, 6 * 86400 + week + 10, 1.0)])
    out2 = cohort_retention(ev2, user_col="user_id", ts_col="ts")
    rows2 = {(r["cohort"], r["week_offset"]): r["active_users"] for r in out2.collect()}
    assert rows2 == {(0, 0): 1, (0, 1): 1}


def test_cohort_counts_distinct_users_once_per_offset(spark):
    # two events same user same offset week -> counted once
    ev = _ev(spark, [(1, 0, 1.0), (1, 100, 1.0), (2, 0, 1.0)])
    out = cohort_retention(ev, user_col="user_id", ts_col="ts")
    rows = {(r["cohort"], r["week_offset"]): r["active_users"] for r in out.collect()}
    assert rows == {(0, 0): 2}


def test_cohort_reserved_name_raises(spark):
    ev = _ev(spark, [(1, 0, 1.0)]).withColumnRenamed("value", "cohort")
    with pytest.raises(ValueError, match="reserved"):
        cohort_retention(ev, user_col="user_id", ts_col="ts")


# ---------------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------------

from dlp_rdb_bq_import_spark.operators.timeseries import event_transitions  # noqa: E402


def _seq(spark, rows):
    """rows: (user, seq_no, state)"""
    return spark.createDataFrame(
        [Row(user_id=u, ts=T0 + dt.timedelta(seconds=s), event_id=s, state=st)
         for u, s, st in rows]
    )


def test_transitions_counts_and_probs(spark):
    # user 1: A->B->A->B ; user 2: A->B  => A->B n=3, B->A n=1
    ev = _seq(spark, [(1, 0, "A"), (1, 1, "B"), (1, 2, "A"), (1, 3, "B"),
                      (2, 0, "A"), (2, 1, "B")])
    out = {(r["from_state"], r["to_state"]): r for r in event_transitions(
        ev, key_col="user_id", state_col="state", order_cols=["ts", "event_id"]
    ).collect()}
    assert out[("A", "B")]["n"] == 3 and out[("A", "B")]["prob"] == 1.0
    assert out[("B", "A")]["n"] == 1 and out[("B", "A")]["prob"] == 1.0


def test_transitions_probs_sum_to_one_per_from_state(spark):
    ev = _seq(spark, [(1, 0, "A"), (1, 1, "B"), (1, 2, "A"), (1, 3, "C"),
                      (2, 0, "A"), (2, 1, "B"), (2, 2, "B")])
    rows = event_transitions(
        ev, key_col="user_id", state_col="state", order_cols=["ts", "event_id"]
    ).collect()
    sums: dict[str, float] = {}
    for r in rows:
        sums[r["from_state"]] = sums.get(r["from_state"], 0.0) + r["prob"]
    for s, total in sums.items():
        assert abs(total - 1.0) < 1e-12, (s, total)


def test_transitions_no_cross_user_leakage(spark):
    # last state of user 1 must not chain into first state of user 2
    ev = _seq(spark, [(1, 0, "A"), (1, 1, "B"), (2, 5, "C"), (2, 6, "D")])
    out = {(r["from_state"], r["to_state"]) for r in event_transitions(
        ev, key_col="user_id", state_col="state", order_cols=["ts", "event_id"]
    ).collect()}
    assert out == {("A", "B"), ("C", "D")}


def test_transitions_reserved_name_raises(spark):
    ev = _seq(spark, [(1, 0, "A")]).withColumnRenamed("state", "prob")
    with pytest.raises(ValueError, match="reserved"):
        event_transitions(ev, key_col="user_id", state_col="prob",
                          order_cols=["ts"])


def test_resample_null_values_do_not_deflate_mean(spark):
    # bucket holds [2.0, NULL]: mean must be 2.0 (divide by non-null
    # count), n_events still counts both rows
    ev = spark.createDataFrame(
        [(1, T0, 2.0), (1, T0 + dt.timedelta(seconds=30), None)],
        "user_id long, ts timestamp, value double",
    )
    out = resample_gapfill(
        ev, ts_col="ts", key_cols=["user_id"], value_col="value",
        grain_seconds=3600,
    ).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 2
    assert out[0]["avg_value"] == 2.0


def test_resample_all_null_bucket_has_null_mean(spark):
    ev = spark.createDataFrame(
        [(1, T0, None)], "user_id long, ts timestamp, value double"
    )
    out = resample_gapfill(
        ev, ts_col="ts", key_cols=["user_id"], value_col="value",
        grain_seconds=3600,
    ).collect()
    assert out[0]["n_events"] == 1 and out[0]["avg_value"] is None


# ---------------------------------------------------------------------------
# interval_concurrency
# ---------------------------------------------------------------------------

from dlp_rdb_bq_import_spark.operators.timeseries import interval_concurrency  # noqa: E402


def test_concurrency_overlap_and_halfopen_boundary(spark):
    # [0,2h), [1h,3h): overlap in [1h,2h) -> peak 2; at 2h the first
    # interval's end and nothing else -> back to 1. Touching intervals
    # [3h,4h) after [2h,3h)... covered by the 2h boundary: end sorts
    # with the start at the same instant via the per-instant net delta.
    def ts(h):
        return T0 + dt.timedelta(hours=h)

    iv = spark.createDataFrame(
        [(ts(0), ts(2)), (ts(1), ts(3))], "s timestamp, e timestamp"
    )
    out = {r["ts"]: (r["delta"], r["concurrent"])
           for r in interval_concurrency(iv, start_col="s", end_col="e").collect()}
    assert out[ts(0)] == (1, 1)
    assert out[ts(1)] == (1, 2)   # peak
    assert out[ts(2)] == (-1, 1)
    assert out[ts(3)] == (-1, 0)


def test_concurrency_same_instant_start_end_nets_out(spark):
    # one interval ends exactly where another starts: net delta 0,
    # concurrency stays 1 (half-open semantics, no phantom 2 or 0)
    def ts(h):
        return T0 + dt.timedelta(hours=h)

    iv = spark.createDataFrame(
        [(ts(0), ts(1)), (ts(1), ts(2))], "s timestamp, e timestamp"
    )
    out = {r["ts"]: (r["delta"], r["concurrent"])
           for r in interval_concurrency(iv, start_col="s", end_col="e").collect()}
    assert out[ts(1)] == (0, 1)


def test_concurrency_per_key_independent(spark):
    def ts(h):
        return T0 + dt.timedelta(hours=h)

    iv = spark.createDataFrame(
        [("a", ts(0), ts(2)), ("a", ts(1), ts(3)), ("b", ts(0), ts(1))],
        "k string, s timestamp, e timestamp",
    )
    out = {(r["k"], r["ts"]): r["concurrent"]
           for r in interval_concurrency(
               iv, start_col="s", end_col="e", key_cols=["k"]).collect()}
    assert out[("a", ts(1))] == 2
    assert out[("b", ts(0))] == 1
    assert out[("b", ts(1))] == 0


def test_funnel_steps_ordering_semantics(spark):
    """Funnel completion requires strict temporal order per user: a
    click BEFORE the first view does not count (but a later one does),
    repeats only count once, step events at the exact same timestamp
    as the previous step do not qualify (strictly after), conversion
    ratios divide adjacent counts, and bad step lists fail loudly."""
    import datetime

    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.timeseries import funnel_steps

    def ts(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    rows = [
        # u1 completes all three in order
        (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        # u2: click precedes view, another click after -> completes 2
        (2, ts(0), "click"), (2, ts(1), "view"), (2, ts(3), "click"),
        # u3: click at the same instant as view -> NOT strictly after
        (3, ts(0), "view"), (3, ts(0), "click"),
        # u4: purchase before click -> stops at click
        (4, ts(0), "view"), (4, ts(1), "purchase"), (4, ts(2), "click"),
        # u5: never views -> not even step 1
        (5, ts(0), "click"), (5, ts(1), "purchase"),
        # u1 repeats don't double-count
        (1, ts(5), "view"), (1, ts(6), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r.step_ord: (r.step, r.n_users, r.conversion)
        for r in funnel_steps(
            df, ["view", "click", "purchase"],
            user_col="user_id", ts_col="ts", type_col="event_type",
        ).collect()
    }
    assert out[1] == ("view", 4, 1.0)          # u1 u2 u3 u4
    assert out[2] == ("click", 3, 0.75)        # u1 u2 u4 (u3 same-instant)
    assert out[3] == ("purchase", 1, round(1 / 3, 9))  # u1 only
    with _pytest.raises(ValueError, match=">= 2 steps"):
        funnel_steps(df, ["view"], user_col="user_id", ts_col="ts",
                     type_col="event_type")
    with _pytest.raises(ValueError, match="distinct"):
        funnel_steps(df, ["view", "view"], user_col="user_id", ts_col="ts",
                     type_col="event_type")
