"""Driver-contract integrity: every oracle has a query, the entry
point runs, and no harness query emits the array/map columns that
break the gate's canonical row sort (r01's only hard failure class)."""

from __future__ import annotations

import pyspark.sql.types as T

from dlp_rdb_bq_import_spark import harness


def test_every_oracle_key_has_a_query():
    qs, oracles = harness.queries(), harness.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_every_bench_query_is_registered():
    """A stale name in bench.py's headline list crashes the driver's
    per-round bench mid-run; pin the list to the registry here."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    )
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = harness.queries()
    unresolved = [n for n in mod.BENCH_QUERIES if n not in qs]
    assert not unresolved, f"bench names not in registry: {unresolved}"
    assert len(set(mod.BENCH_QUERIES)) == len(mod.BENCH_QUERIES)
    # VERDICT r13 task 8: benched ∪ excluded-with-reason == registry,
    # disjointly — a new query cannot silently skip the bench
    assert set(mod.BENCH_QUERIES) | set(mod.EXCLUDED) == set(qs)
    assert not set(mod.BENCH_QUERIES) & set(mod.EXCLUDED)
    assert all(r.strip() for r in mod.EXCLUDED.values())


def test_scratch_memo_rerun_is_identical(spark, sf_dir):
    """The steady-state seam the min-of-N soak measures: a second
    in-process run of a memoized incremental query reuses its
    persisted artifact (the memo gains the site key) and returns
    EXACTLY the first run's rows — reuse must be a pure speedup,
    never a semantic change."""
    qs = harness.queries()

    def run():
        rows = qs["decontam_incremental"](spark, sf_dir).collect()
        return sorted(tuple(r[k] for k in r.asDict()) for r in rows)

    first = run()
    assert any(
        k[1] == "bench_grams" for k in harness._SCRATCH_MEMO
    ), "memo never populated"
    assert run() == first


def test_gate_queries_emit_scalar_columns_only(spark):
    """The driver canonicalizes by sorting all columns; array/map/struct
    output columns make pandas sort_values throw. Every registered
    query's schema must be scalar-only (checked at plan time — no
    execution, so this covers all ~90 queries cheaply)."""
    sf = "/root/testdata/sf0.001"
    banned = (T.ArrayType, T.MapType, T.StructType)
    offenders = {}
    for name, fn in harness.queries().items():
        if name.startswith("streaming_"):
            continue  # streaming queries execute eagerly; schema pinned by gate runs
        schema = fn(spark, sf).schema
        bad = [f.name for f in schema.fields if isinstance(f.dataType, banned)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar gate outputs: {offenders}"


def test_zscore_null_values_flag_false_and_overflow_raises(spark):
    """Null metric values get is_outlier=false (not NULL); groups whose
    t^2*n^2*max^2 cannot fit int64 raise instead of wrapping (ADVICE r3)."""
    import pytest
    from pyspark.sql import functions as F

    from dlp_rdb_bq_import_spark.operators.profiling import integer_zscore_outliers

    df = spark.createDataFrame(
        [("a", 10), ("a", 12), ("a", None), ("a", 11)], "g string, x int"
    )
    rows = integer_zscore_outliers(df, "x", ["g"]).collect()
    flags = {r.x: r.is_outlier for r in rows}
    assert flags[None] is False
    assert all(v is not None for v in flags.values())

    big = spark.createDataFrame(
        [("a", (1 << 40)), ("a", (1 << 40) + 3)], "g string, x long"
    )
    with pytest.raises(Exception, match="overflow"):
        integer_zscore_outliers(big, "x", ["g"]).collect()


def test_zscore_all_null_group_no_spurious_overflow(spark):
    """A group whose metric is entirely NULL must produce false flags,
    not a spurious overflow error (n=0 has nothing to overflow)."""
    from dlp_rdb_bq_import_spark.operators.profiling import integer_zscore_outliers

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 5)], "g string, x int"
    )
    rows = integer_zscore_outliers(df, "x", ["g"]).collect()
    assert all(r.is_outlier is False for r in rows)
