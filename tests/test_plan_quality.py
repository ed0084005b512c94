"""Plan-quality regression tests for the headline queries: the things
`.explain` must keep showing for the 100 TB posture to hold — dims
broadcast, filters/projections reaching the parquet scan, whole-stage
codegen on the hot aggregations, and NO cartesian product in any
production near-dup path (the all-pairs shapes are oracle-only).

These tests pin the *plan*, not the result; the oracle gate pins
results. A refactor that silently turns a broadcast join into a
shuffle join, or un-pushes a scan filter, fails here first.
"""

from __future__ import annotations

import pytest

from dlp_rdb_bq_import_spark import harness

SF = "/root/testdata/sf0.001"


def final_plan(df) -> str:
    """Materialize (so AQE settles on the final plan) and render the
    formatted physical plan — unlike executedPlan().toString(), the
    formatted mode prints scan metadata (PushedFilters/ReadSchema)
    untruncated."""
    df.collect()  # count() would execute a different plan; collect
    # drives THIS DataFrame's queryExecution so AQE finalizes it
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def qs():
    return harness.queries()


def test_tpch_q3_broadcasts_customer_dim(spark, qs):
    plan = final_plan(qs["tpch_q3_shipping_priority"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_tpch_q5_broadcasts_nation_and_region(spark, qs):
    plan = final_plan(qs["tpch_q5_local_volume"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_tpch_q1_filter_pushed_and_codegen(spark, qs):
    plan = final_plan(qs["tpch_q1"](spark, SF))
    assert "LessThanOrEqual(l_shipdate" in plan  # scan-level filter
    assert "[codegen id :" in plan  # whole-stage codegen spans present
    # column pruning: orderkey/partkey/suppkey are never read
    readschema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert readschema and "l_orderkey" not in readschema[0]


def test_pushdown_scan_prunes_columns_and_pushes_filters(spark, qs):
    plan = final_plan(qs["pushdown_scan"](spark, SF))
    assert "GreaterThan(l_discount,0.08)" in plan  # filter reached the scan
    # projection pruned to the 4 referenced columns — wide columns like
    # l_extendedprice/l_tax must not be read
    readschema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert readschema and "l_extendedprice" not in readschema[0]
    assert "l_shipdate" in readschema[0]


def test_tpch_q9_prunes_part_before_join(spark, qs):
    """The LIKE filter must reach the part scan, not run post-join."""
    plan = final_plan(qs["tpch_q9_product_profit"](spark, SF))
    assert "StringContains(p_name,red)" in plan


def test_production_neardup_paths_have_no_cartesian_product(spark, qs):
    """The scale paths must be banded equi-joins; only the small oracle
    queries may cross-join. BroadcastNestedLoopJoin is the other
    all-pairs spelling and is equally banned."""
    for name in ("dedup_minhash_lsh", "dedup_simhash", "embedding_neardup_lsh"):
        plan = final_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, f"{name} degenerated to all-pairs"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} degenerated to all-pairs"


def test_text_analysis_stays_jvm_side(spark, qs):
    """No row-at-a-time Python in the text-analysis path: the scalars
    are built-in expressions, so the plan must contain no Python eval
    operator of any flavor."""
    plan = final_plan(qs["text_analysis"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_exact_dedup_single_shuffle(spark, qs):
    """Exact dedup is one hash aggregation: exactly one exchange (on
    the dedup key), partial aggregation before it."""
    plan = final_plan(qs["dedup_exact"](spark, SF))
    # AQE prints final + initial trees; count exchanges in the final one
    tree = plan.split("== Initial Plan ==")[0]
    assert tree.count("Exchange (") == 1
    assert "partial_min" in plan  # map-side combine before the shuffle


def test_decontaminate_broadcasts_benchmark_side(spark, qs):
    """The benchmark n-gram set must broadcast (training side never
    shuffles before the per-pair count), and the training scan must not
    read text into the join key — n-grams travel as xxhash64."""
    plan = final_plan(qs["decontaminate_overlap"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sequence_packing_single_exchange_no_python(spark, qs):
    """Packing is one window over the stream key: exactly one exchange
    in the final plan, all-JVM expressions."""
    plan = final_plan(qs["sequence_packing"](spark, SF))
    tree = plan.split("== Initial Plan ==")[0]
    assert tree.count("Exchange (") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_dedup_no_cartesian(spark, qs):
    """SemDeDup candidates come from the cell equi-join — a cross join
    anywhere means the cell bucketing silently degenerated."""
    plan = final_plan(qs["semantic_dedup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_anti_join_on_fingerprint(spark, qs):
    plan = final_plan(qs["dedup_incremental"](spark, SF))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime bloom-filter join pruning (session default ON): a
    selective dim filter injects a might_contain predicate into the
    fact-table scan stage, cutting shuffle input before the join. The
    application-side size threshold (10 GB default) is what keeps it
    from firing at fixture scale, so the test lowers it — at the 100 TB
    design point it fires on its own."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = final_plan(j)
        assert "might_contain" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_global_sort_uses_range_partitioning(spark, qs):
    """A global ORDER BY must plan as a sampled range-partitioning
    exchange (each partition holds a contiguous key range — the only
    sort shape that scales out), never a single-partition sort."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF}/lineitem.parquet").orderBy(
        F.col("l_extendedprice").desc()
    )
    plan = final_plan(df)
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_incident_overlap_join_no_nested_loop(spark, qs):
    """The bucketed range join must plan as an equi-join on bucket id —
    never the BroadcastNestedLoopJoin Spark gives bare inequality
    joins."""
    plan = final_plan(qs["incident_overlap_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_click_signup_plans_without_join(spark, qs):
    """The as-of is union+window: no pairwise join node of any kind."""
    plan = final_plan(qs["asof_click_signup"](spark, SF))
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin", "ShuffledHashJoin"):
        assert node not in plan
    assert "Window" in plan


def test_rollup_cascade_scans_raw_once(spark, qs):
    """The cascade reads events exactly once; coarser levels
    re-aggregate partials (no second scan of the raw table)."""
    plan = final_plan(qs["rollup_cascade"](spark, SF))
    # formatted explain prints the tree twice (final + initial AQE plan)
    # but details once per distinct node: count "(n) Scan parquet" details
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1


def test_skew_report_uses_take_ordered(spark, qs):
    """Top-N must be TakeOrderedAndProject (limit pushed into the
    sort), not a global Sort + CollectLimit."""
    plan = final_plan(qs["skew_report"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_global_row_ids_no_single_partition_window(spark, qs):
    """The whole point of the operator: the naive ROW_NUMBER() OVER
    (ORDER BY ...) funnels the table through one task; ours must not."""
    df = qs["global_row_ids"](spark, SF)
    plan = final_plan(df)
    assert "SinglePartition" not in plan
    # and the naive formulation DOES, proving the assertion has teeth
    naive = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
        "row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rid"
    )
    assert "SinglePartition" in naive._jdf.queryExecution().executedPlan().toString()


def test_round10_host_graph_paths_no_cartesian(spark, qs):
    """BFS, SSSP and co-citation over the host graph stay keyed
    equi-joins: no cartesian/BNLJ spelling anywhere (the graph is
    small at fixture scale, but the PLAN must be the web-scale one)."""
    for name in ("host_distance_bfs", "host_weighted_sssp", "host_cocitation"):
        plan = final_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_phrase_search_joins_are_keyed_on_planted_matches(spark):
    """On a planted corpus WITH matches (the sf0.001 fixture has none,
    which would let AQE collapse to EmptyRelation and make any plan
    assertion vacuous), the adjacency joins are keyed hash joins —
    no cartesian, no nested-loop. The term pre-filter itself sits
    behind the operator's eager checkpoint and is pinned by the unit
    tests; this guards the join phase."""
    from dlp_rdb_bq_import_spark.operators.text import phrase_match

    df = spark.createDataFrame(
        [(i, "x value table part y") for i in range(50)],
        "doc_id long, text string",
    )
    out = phrase_match(df, ["value", "table", "part"])
    plan = final_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 50


def test_sorted_neighborhood_avoids_single_partition_window(spark, qs):
    """The SNM pairing must ride the range-exchange row-id path: no
    SinglePartition exchange anywhere and no all-pairs join spelling.
    (The range exchange itself sits behind global_row_ids' checkpoint
    and is pinned by the layout tests — this guards the join side.)"""
    plan = final_plan(qs["sorted_neighborhood_pairs"](spark, SF))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_binning_boundary_attach_uses_array_percentile(spark, qs):
    """quantile_binning/calibration_curve: the boundary aggregate must
    be the ARRAY form (one shared buffer), never n_bins-1 separate
    percentile expressions each buffering the column — the round-10
    perf lesson (21.3s -> 6.2s at sf1) pinned as a plan shape."""
    # the ANALYZED plan prints aggregate expressions untruncated (the
    # formatted physical plan elides long literals behind "..."). ONE
    # percentile occurrence with an array literal IS the array form —
    # the scalar form would occur n_bins-1 times with no array.
    for name in ("quantile_binning", "calibration_curve"):
        an = qs[name](spark, SF)._jdf.queryExecution().analyzed().toString()
        assert an.count("percentile(") == 1, name
        assert "array(0." in an, name


def test_bloom_semi_join_screens_before_exact_join(spark, qs):
    """The Bloom screen must sit beneath an exact HASH semi-join: the
    plan carries the bitmap attach (the only nested-loop node) plus a
    LeftSemi hash join — never a nested-loop for the exact phase and
    never a cartesian."""
    plan = final_plan(qs["bloom_semi_join"](spark, SF))
    assert "CartesianProduct" not in plan
    semi_lines = [
        ln for ln in plan.splitlines() if "LeftSemi" in ln
    ]
    assert semi_lines and all(
        "NestedLoop" not in ln for ln in semi_lines
    )  # the exact semi-join is a hash join; only the bitmap attach nests


def test_salted_aggregate_keyed_exchanges_only(spark, qs):
    """The two-phase fold is keyed exchanges only: hash partitioning,
    no SinglePartition funnel, no join nodes at all."""
    plan = final_plan(qs["salted_group_stats"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert "Join" not in plan
    assert "hashpartitioning" in plan
