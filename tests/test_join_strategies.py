"""Plan-shape tests for the shuffle-discipline join utilities: the
bucketed join must contain NO exchange in its physical plan, and the
salted join must return exactly the plain-join result while spreading
hot keys."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dlp_rdb_bq_import_spark.operators.joins import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_flag")
    )
    items = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("o_key"), F.col("id").alias("item_id")
    )
    write_bucketed(
        orders, "b_orders", ["o_key"], num_buckets=8, sort_cols=["o_key"],
        path=str(wh / "b_orders"),
    )
    write_bucketed(
        items, "b_items", ["o_key"], num_buckets=8, sort_cols=["o_key"],
        path=str(wh / "b_items"),
    )
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """With broadcast ruled out (the 100 TB case: both sides too big),
    the bucketed sort-merge join must read bucket i against bucket i
    with no shuffle exchange on either side."""
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["o_key"])
        assert joined.count() == 30_000  # every item matches exactly one order
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, (
        f"bucketed join still shuffles:\n{plan[:2000]}"
    )
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["o_key"])
    agg = joined.groupBy("o_flag").count().collect()
    assert {r["o_flag"]: r["count"] for r in agg} == {
        i: sum(3 for k in range(10_000) if k % 7 == i) for i in range(7)
    }


def test_salted_join_exact_result_under_skew(spark):
    """90% of fact rows share ONE key; the salted join must return
    byte-identical results to the plain join."""
    facts = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (20, "cold20"), (30, "cold30")], ["k", "label"]
    )
    plain = facts.join(dim, "k").select("fact_id", "label")
    salted = salted_join(facts, dim, "k", salt=8).select("fact_id", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in multiple salt groups (the whole
    point: no single straggler partition)."""
    facts = spark.range(0, 8_000).select(F.lit(1).alias("k"), F.col("id").alias("fact_id"))
    salted = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*facts.columns), F.lit(8)).cast("int")
    )
    n_groups = salted.select("_salt").distinct().count()
    assert n_groups == 8


def test_salted_join_outer_semantics(spark):
    """Left join: unmatched fact rows survive with null labels."""
    facts = spark.createDataFrame([(1, 100), (2, 200)], ["k", "fact_id"])
    dim = spark.createDataFrame([(1, "one")], ["k", "label"])
    out = {
        (r["fact_id"], r["label"])
        for r in salted_join(facts, dim, "k", salt=4, how="left").collect()
    }
    assert out == {(100, "one"), (200, None)}


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """With AQE on (session default), a small aggregation's 8 configured
    shuffle partitions collapse to fewer actual partitions at runtime —
    the knob that keeps 100 TB plans from drowning in tiny tasks when a
    filter makes a stage small."""
    df = (
        spark.range(10_000)
        .withColumn("k", F.col("id") % 4)
        .groupBy("k")
        .count()
    )
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "AQEShuffleRead" in plan
    assert "coalesced" in plan.lower()


def test_aqe_splits_skewed_join_partitions(spark):
    """A 95%-hot-key sort-merge join must show AQE's skew handling
    (skew=true on the SMJ) — the runtime complement to explicit
    salting for keys discovered skewed only at execution time."""
    left = spark.range(200_000).withColumn(
        "k", F.when(F.col("id") % 100 < 95, 0).otherwise(F.col("id") % 100)
    )
    right = spark.range(100).withColumnRenamed("id", "k")
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
    }
    try:
        # force SMJ (no broadcast) and make the hot partition count as
        # skewed at this tiny scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        j = left.join(right, "k")
        rows = j.collect()  # count() would execute a different plan
        assert len(rows) == 200_000
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_salted_join_rejects_dim_preserving_how(spark):
    """right/full outer would emit unmatched dim rows once per salt
    value; salted_join must refuse rather than silently duplicate."""
    import pytest

    facts = spark.createDataFrame([(1, "a")], "fact_id long, k string")
    dim = spark.createDataFrame([("a", "x"), ("b", "y")], "k string, label string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(facts, dim, "k", salt=4, how=how)
    # semi/anti stay supported and exact
    semi = salted_join(facts, dim, "k", salt=4, how="left_semi")
    assert [r["fact_id"] for r in semi.collect()] == [1]
    anti = salted_join(facts, dim, "k", salt=4, how="left_anti")
    assert anti.count() == 0


# ---------------------------------------------------------------------------
# asof_join / range_overlap_join
# ---------------------------------------------------------------------------


def _mk_asof_data(spark, seed=7, n_left=400, n_right=120, n_keys=9):
    import numpy as np

    rng = np.random.default_rng(seed)
    left = [
        (int(i), int(rng.integers(0, n_keys)), int(rng.integers(0, 10_000)))
        for i in range(n_left)
    ]
    right = [
        (int(rng.integers(0, n_keys)), int(rng.integers(0, 10_000)), int(100 + i))
        for i in range(n_right)
    ]
    # dedup right per (key, t): keep max quote_id (operator tie rule)
    best = {}
    for k, t_, q in right:
        best[(k, t_)] = max(best.get((k, t_), -1), q)
    right = [(k, t_, q) for (k, t_), q in best.items()]
    ldf = spark.createDataFrame(left, "row_id long, k long, t long")
    rdf = spark.createDataFrame(right, "k long, t long, quote_id long")
    return left, right, ldf, rdf


def _naive_asof(left, right, direction, tolerance=None):
    out = {}
    for row_id, k, t_ in left:
        cands = [
            (rt, q)
            for (rk, rt, q) in right
            if rk == k and (rt <= t_ if direction == "backward" else rt >= t_)
        ]
        if tolerance is not None:
            cands = [(rt, q) for rt, q in cands if abs(rt - t_) <= tolerance]
        if not cands:
            out[row_id] = None
        elif direction == "backward":
            out[row_id] = max(cands)[1]
        else:
            out[row_id] = min(cands)[1]
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_naive(spark, direction):
    from dlp_rdb_bq_import_spark.operators.joins import asof_join

    left, right, ldf, rdf = _mk_asof_data(spark)
    expected = _naive_asof(left, right, direction)
    got = {
        r.row_id: r.quote_id
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="t", direction=direction
        ).collect()
    }
    assert got == expected


def test_asof_join_tolerance_and_inner(spark):
    from dlp_rdb_bq_import_spark.operators.joins import asof_join

    left, right, ldf, rdf = _mk_asof_data(spark, seed=11)
    tol = 500
    expected = _naive_asof(left, right, "backward", tolerance=tol)
    out = asof_join(
        ldf, rdf, on="k", left_ts="t", right_ts="t", tolerance_us=tol, how="inner"
    )
    got = {r.row_id: r.quote_id for r in out.collect()}
    assert got == {k: v for k, v in expected.items() if v is not None}


def test_asof_join_single_shuffle_no_join_node(spark):
    """The whole point: an as-of over two inputs plans as union+window —
    no SortMergeJoin/BroadcastHashJoin/CartesianProduct node at all."""
    from dlp_rdb_bq_import_spark.operators.joins import asof_join

    _, _, ldf, rdf = _mk_asof_data(spark)
    plan = (
        asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin"):
        assert node not in plan


def test_range_overlap_join_matches_naive(spark):
    import numpy as np

    from dlp_rdb_bq_import_spark.operators.joins import range_overlap_join

    rng = np.random.default_rng(3)
    lrows = []
    for i in range(300):
        s = int(rng.integers(0, 50_000))
        lrows.append((int(i), s, s + int(rng.integers(0, 3_000))))
    rrows = []
    for j in range(200):
        s = int(rng.integers(0, 50_000))
        rrows.append((int(1000 + j), s, s + int(rng.integers(0, 800))))
    ldf = spark.createDataFrame(lrows, "lid long, ls long, le long")
    rdf = spark.createDataFrame(rrows, "rid long, rs long, re long")
    expected = {
        (lid, rid)
        for (lid, ls, le) in lrows
        for (rid, rs, re) in rrows
        if ls <= re and rs <= le
    }
    out = range_overlap_join(ldf, rdf, ("ls", "le"), ("rs", "re"), bucket=1_000)
    got = [(r.lid, r.rid) for r in out.collect()]
    assert len(got) == len(set(got)), "bucket attribution must dedup pairs"
    assert set(got) == expected


def test_range_overlap_join_guards(spark):
    from dlp_rdb_bq_import_spark.operators.joins import range_overlap_join

    ldf = spark.createDataFrame([(1, 10, 5)], "lid long, ls long, le long")
    rdf = spark.createDataFrame([(2, 0, 100)], "rid long, rs long, re long")
    # invalid interval (end < start) dropped, not exploded descending
    assert range_overlap_join(ldf, rdf, ("ls", "le"), ("rs", "re"), bucket=10).count() == 0
    with pytest.raises(ValueError, match="collision"):
        range_overlap_join(
            ldf.withColumnRenamed("lid", "rid"), rdf, ("ls", "le"), ("rs", "re"), bucket=10
        )
    with pytest.raises(ValueError, match="positive"):
        range_overlap_join(ldf, rdf, ("ls", "le"), ("rs", "re"), bucket=0)


def test_reserved_internal_names_raise(spark):
    """Inputs that already carry an operator's internal column names
    raise instead of silently clobbering (ADVICE r3)."""
    import pytest

    from dlp_rdb_bq_import_spark.operators.joins import (
        asof_join,
        range_overlap_join,
        salted_join,
    )

    left = spark.createDataFrame([(1, 10, 5)], ["k", "ts", "_t"])
    right = spark.createDataFrame([(1, 9, 1.0)], ["k", "ts", "v"])
    with pytest.raises(ValueError, match="reserved internal"):
        asof_join(left, right, "k", left_ts="ts")
    salted = spark.createDataFrame([(1, "_salt-val")], ["k", "_salt"])
    with pytest.raises(ValueError, match="reserved internal"):
        salted_join(salted, right.select("k", "v"), "k")
    ranged = spark.createDataFrame([(1, 0, 10, 7)], ["k", "s", "e", "_bkt"])
    with pytest.raises(ValueError, match="reserved internal"):
        range_overlap_join(
            ranged,
            right.selectExpr("k", "ts AS rs", "ts AS re"),
            ("s", "e"),
            ("rs", "re"),
            bucket=10,
            on="k",
        )
