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


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------


def test_random_projection_matches_hashlib_reference(spark):
    import hashlib

    import numpy as np

    from dlp_rdb_bq_import_spark.operators.similarity import random_projection

    rng = np.random.RandomState(7)
    vecs = {i: rng.normal(0, 1, 16).astype("float32") for i in range(1, 21)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    out = {(r.id, r.j): r for r in random_projection(
        df, out_dim=4, seed="t"
    ).collect()}
    k = 4
    for i, v in vecs.items():
        q = np.round(np.array([float(x) for x in v], dtype=np.float64) * 1e7)
        for j in range(1, k + 1):
            signs = np.array([
                1 if int(hashlib.md5(f"t:{d+1}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
                else -1
                for d in range(len(v))
            ])
            y = int(np.sum(q * signs))
            r = out[(i, j)]
            assert r.y_int == y, (i, j)
            assert r.proj == y / (1e7 * np.sqrt(float(k)))
    assert len(out) == 20 * k


def test_random_projection_preserves_distances_statistically(spark):
    """The JL property on a planted geometry: with enough output dims,
    projected squared distances concentrate around the originals."""
    import numpy as np
    import pytest

    from dlp_rdb_bq_import_spark.operators.similarity import random_projection

    rng = np.random.RandomState(11)
    vecs = rng.normal(0, 1, (30, 64))
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = random_projection(sdf, out_dim=32, seed="jlprop").collect()
    proj = np.zeros((30, 32))
    for r in out:
        proj[r.id, r.j - 1] = r.proj
    d_orig = np.linalg.norm(vecs[:1] - vecs[1:], axis=1)
    d_proj = np.linalg.norm(proj[:1] - proj[1:], axis=1)
    ratio = d_proj / d_orig
    assert 0.6 < ratio.min() and ratio.max() < 1.5  # JL concentration band
    assert abs(float(np.median(ratio)) - 1.0) < 0.2
    with pytest.raises(ValueError, match="out_dim"):
        random_projection(sdf, out_dim=0)
