"""Unit tests for similarity.quantize_embeddings_int8: code range,
round-trip error bound, zero-vector handling, determinism, and a plan
check that the whole operator stays JVM-side (no Python eval nodes)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.similarity import quantize_embeddings_int8


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows],
        schema="vec_id long, embedding array<float>",
    )


def test_codes_in_range_and_max_dim_hits_127(spark):
    df = _vecs(spark, [(0, [0.5, -1.0, 0.25, 0.0])])
    out = {r["dim"]: r for r in quantize_embeddings_int8(df).collect()}
    assert all(-127 <= r["q"] <= 127 for r in out.values())
    assert out[1]["q"] == -127  # the max-|x| dimension saturates
    assert out[0]["q"] == 64   # round(0.5*127/1.0) = round(63.5) -> 64 (half up)
    assert out[2]["q"] == 32   # round(31.75)
    assert out[3]["q"] == 0
    assert all(r["scale"] == 1.0 for r in out.values())


def test_roundtrip_error_within_half_step(spark):
    vals = [0.913, -0.27, 0.031, -0.64, 0.111]
    df = _vecs(spark, [(0, vals)])
    rows = quantize_embeddings_int8(df).collect()
    scale = rows[0]["scale"]
    for r in rows:
        # float32 storage of the input adds at most ~1e-7 relative slop
        approx = r["q"] * scale / 127.0
        orig = vals[r["dim"]]
        assert abs(approx - orig) <= scale / 254.0 + 1e-6, (r["dim"], approx, orig)


def test_zero_vector_all_zero_codes(spark):
    df = _vecs(spark, [(7, [0.0, 0.0, 0.0])])
    rows = quantize_embeddings_int8(df).collect()
    assert [(r["q"], r["scale"]) for r in rows] == [(0, 0.0)] * 3


def test_deterministic_across_runs(spark):
    df = _vecs(spark, [(i, [((i * 31 + d * 7) % 13 - 6) / 6.0 for d in range(8)])
                       for i in range(20)])
    a = sorted(map(tuple, quantize_embeddings_int8(df).collect()))
    b = sorted(map(tuple, quantize_embeddings_int8(df).collect()))
    assert a == b


def test_plan_stays_jvm_side(spark):
    df = _vecs(spark, [(0, [1.0, 2.0])])
    plan = quantize_embeddings_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_reserved_name_guard(spark):
    df = _vecs(spark, [(0, [1.0])]).withColumnRenamed("vec_id", "scale")
    with pytest.raises(ValueError, match="reserved"):
        quantize_embeddings_int8(df, id_col="scale")
