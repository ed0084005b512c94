"""Round-15 ADVICE fixes.

1. holt_linear folds NULL ids AFTER non-null ids on a (ts) tie —
   the pre-r14 pandas sort's na_position='last' (and DuckDB's ORDER BY
   NULLS LAST), which Spark's default asc() had silently flipped.
2. holt_linear keeps a NULL float key and a NaN float key as DISTINCT
   groups (groupBy semantics), though Arrow delivers both as NaN.
3. _jaro_winkler_block routes strings longer than _JW_VECTOR_MAX_LEN
   to the scalar scorer (bounded memory) with bit-identical scores.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from dlp_rdb_bq_import_spark.operators.linkage import (
    _JW_VECTOR_MAX_LEN,
    _jaro_winkler_block,
    jaro_winkler,
)
from dlp_rdb_bq_import_spark.operators.timeseries import holt_linear


def _holt_reference(rows, alpha=0.4, beta=0.3):
    """The documented per-key recurrence over rows already in fold
    order: level1=y1, trend1=0; then the coupled update."""
    out = []
    level = trend = None
    for i, y in enumerate(rows):
        if i == 0:
            level, trend = float(y), 0.0
        else:
            new_level = alpha * float(y) + (1 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1 - beta) * trend
            level = new_level
        out.append((round(level, 9), round(trend, 9)))
    return out


def test_holt_null_id_ties_fold_last(spark):
    # two rows tie on (key, ts); the NULL id must fold AFTER id=1
    df = spark.createDataFrame(
        [("k", "2024-01-01", 1, 10.0),
         ("k", "2024-01-01", None, 20.0),
         ("k", "2024-01-02", 2, 30.0)],
        "k string, d string, id long, v double",
    ).select("k", F.to_timestamp("d").alias("ts"), "id", "v")
    got = {
        (r["id"],): (r["level"], r["trend"])
        for r in holt_linear(df, "ts", "v", ["k"], "id").collect()
    }
    # fold order: id=1 (y=10), id=NULL (y=20), id=2 (y=30)
    ref = _holt_reference([10.0, 20.0, 30.0])
    assert got[(1,)] == ref[0]
    assert got[(None,)] == ref[1]
    assert got[(2,)] == ref[2]


def test_holt_float_key_null_vs_nan_are_distinct_groups(spark):
    nan = float("nan")
    df = spark.createDataFrame(
        [(None, "2024-01-01", 1, 10.0),
         (None, "2024-01-02", 2, 20.0),
         (nan, "2024-01-01", 3, 100.0),
         (nan, "2024-01-02", 4, 200.0)],
        "k double, d string, id long, v double",
    ).select("k", F.to_timestamp("d").alias("ts"), "id", "v")
    rows = {r["id"]: r for r in holt_linear(df, "ts", "v", ["k"], "id").collect()}
    # both groups must START a fresh fold: first row level=y, trend=0
    assert (rows[1]["level"], rows[1]["trend"]) == (10.0, 0.0)
    assert (rows[3]["level"], rows[3]["trend"]) == (100.0, 0.0)
    # and their second rows continue their OWN group's fold
    assert (rows[2]["level"], rows[2]["trend"]) == _holt_reference([10.0, 20.0])[1]
    assert (rows[4]["level"], rows[4]["trend"]) == _holt_reference([100.0, 200.0])[1]


def test_jw_long_strings_scalar_fallback_bit_identical():
    rng = random.Random(11)
    pairs = []
    for _ in range(300):
        la = rng.choice([0, 3, 40, _JW_VECTOR_MAX_LEN, _JW_VECTOR_MAX_LEN + 1, 2000])
        lb = rng.choice([0, 3, 40, _JW_VECTOR_MAX_LEN, 2000])
        a = "".join(rng.choice(string.ascii_lowercase + "é五") for _ in range(la))
        b = "".join(rng.choice(string.ascii_lowercase + "é五") for _ in range(lb))
        pairs.append((a, b))
    pairs += [(None, "x"), ("x" * 5000, "x" * 5000)]
    got = _jaro_winkler_block([p[0] for p in pairs], [p[1] for p in pairs])
    exp = [
        None if (a is None or b is None) else round(jaro_winkler(a, b), 9)
        for a, b in pairs
    ]
    assert got == exp
