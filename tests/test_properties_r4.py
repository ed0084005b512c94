"""Property tests for round-4 operators: invariants that must hold for
ANY input, not just the fixtures. Pure-numpy properties run at full
hypothesis scale; Spark-backed ones use few examples (a Spark action
per example)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dlp_rdb_bq_import_spark.operators.multimodal import dhash_pixels


@given(
    st.integers(9, 40),   # width
    st.integers(8, 32),   # height
    st.integers(1, 35),   # brightness shift
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_dhash_brightness_invariance_property(w, h, shift, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 220, (h, w, 3)).astype(np.uint8)  # headroom for shift
    shifted = (img.astype(np.int16) + shift).clip(0, 255).astype(np.uint8)
    a, b = dhash_pixels(img), dhash_pixels(shifted)
    assert a == b
    assert -(2**63) <= a < 2**63  # valid signed int64


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_dhash_nearest_neighbor_upscale_property(seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
    up = img.repeat(2, axis=0).repeat(2, axis=1)
    assert dhash_pixels(img) == dhash_pixels(up)


def test_association_rule_invariants_random_baskets(spark):
    """For arbitrary basket data: support <= min(item supports),
    confidence in (0, 1], lift > 0, and lift symmetric across rule
    direction."""
    from dlp_rdb_bq_import_spark.operators.itemsets import association_rules

    rng = np.random.RandomState(7)
    rows = [(int(rng.randint(30)), int(rng.randint(12))) for _ in range(400)]
    df = spark.createDataFrame(rows, "bk long, it long")
    out = association_rules(df, basket_col="bk", item_col="it", min_support=2)
    rules = out.collect()
    assert rules, "fixture produced no rules — weaken the generator"
    lifts = {}
    # distinct-basket item supports for the bound check
    supp = {r["it"]: r["n"] for r in
            df.distinct().groupBy("it").agg(
                __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    for r in rules:
        assert 0 < r["confidence"] <= 1.0
        assert r["lift"] > 0
        assert r["support"] <= min(supp[r["antecedent"]], supp[r["consequent"]])
        lifts[(r["antecedent"], r["consequent"])] = r["lift"]
    for (a, b), v in lifts.items():
        assert lifts[(b, a)] == v  # lift is direction-symmetric


def test_interval_concurrency_invariants_random(spark):
    """Every interval that opens closes: the final running sum is 0,
    and the peak never exceeds the interval count."""
    import datetime as dt

    from dlp_rdb_bq_import_spark.operators.timeseries import interval_concurrency

    rng = np.random.RandomState(11)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for _ in range(60):
        s = int(rng.randint(0, 5000))
        rows.append(
            (t0 + dt.timedelta(seconds=s),
             t0 + dt.timedelta(seconds=s + 1 + int(rng.randint(1, 900)))))
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    out = interval_concurrency(df, start_col="s", end_col="e").orderBy("ts").collect()
    assert out[-1]["concurrent"] == 0
    assert max(r["concurrent"] for r in out) <= len(rows)
    assert all(r["concurrent"] >= 0 for r in out)


def test_quantize_roundtrip_bound_random_vectors(spark):
    """Dequantization error is bounded by half a quantization step for
    every dimension of every vector."""
    from pyspark.sql import Row

    from dlp_rdb_bq_import_spark.operators.similarity import quantize_embeddings_int8

    rng = np.random.RandomState(3)
    vecs = [(i, rng.uniform(-2, 2, 16).astype(np.float32)) for i in range(30)]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in vecs],
        schema="vec_id long, embedding array<float>",
    )
    by_id = {i: v for i, v in vecs}
    for r in quantize_embeddings_int8(df).collect():
        orig = float(by_id[r["vec_id"]][r["dim"]])
        approx = r["q"] * r["scale"] / 127.0
        assert abs(approx - orig) <= r["scale"] / 254.0 + 1e-6
