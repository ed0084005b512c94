"""Z-order layout tests: the interleave math against a Python
reference, and the actual file-pruning win measured from real parquet
footer statistics (the mechanism a 100 TB scan's skip decisions run
on).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from dlp_rdb_bq_import_spark.operators.layout import (
    interleave_bits,
    linear_bucket,
    zorder_key,
    zorder_write,
)


def _morton_ref(b0: int, b1: int, bits: int = 8) -> int:
    z = 0
    for bit in range(bits):
        z |= ((b0 >> bit) & 1) << (bit * 2)
        z |= ((b1 >> bit) & 1) << (bit * 2 + 1)
    return z


def test_interleave_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 256, (i * 101) % 256) for i in range(300)],
        "id long, a long, b long",
    )
    out = df.select(
        "id", "a", "b", interleave_bits([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton_ref(r["a"], r["b"])


def test_zorder_quadrant_ordering(spark):
    """The property range-partitioning exploits: the curve finishes one
    quadrant before entering the opposite one, so every point with both
    top bits clear sorts before every point with both top bits set."""
    import random

    rng = random.Random(0)
    low = [(i, rng.randrange(0, 128), rng.randrange(0, 128)) for i in range(200)]
    high = [(200 + i, rng.randrange(128, 256), rng.randrange(128, 256)) for i in range(200)]
    df = spark.createDataFrame(low + high, "id long, x long, y long")
    out = df.select(
        "id", interleave_bits([F.col("x"), F.col("y")], 8).alias("z")
    ).collect()
    z = {r["id"]: r["z"] for r in out}
    assert max(z[i] for i, *_ in low) < min(z[i] for i, *_ in high)


def _file_stats(path: str, col_index: int) -> list[tuple[int, int]]:
    stats = []
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, fname)).metadata
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_index).statistics
            mins.append(st.min)
            maxs.append(st.max)
        stats.append((min(mins), max(maxs)))
    return stats


def test_zorder_write_prunes_files_on_secondary_column(spark, tmp_path):
    """The discriminating case: filter on y ONLY. An x-sorted layout has
    every file spanning the full y range (zero pruning); the Z-ordered
    layout keeps y ranges tight per file, so footer stats exclude at
    least half the files for a quarter-range predicate."""
    df = spark.range(100_000).select(
        F.col("id"),
        (F.abs(F.xxhash64("id")) % 256).alias("x"),
        (F.abs(F.xxhash64((F.col("id") + 1_000_000).cast("long"))) % 256).alias("y"),
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear_x")
    zorder_write(df, zpath, ["x", "y"], num_files=16)
    df.repartitionByRange(16, "x").write.mode("overwrite").parquet(lpath)

    # column index of y in the written schema
    sample = [f for f in os.listdir(zpath) if f.endswith(".parquet")][0]
    names = pq.ParquetFile(os.path.join(zpath, sample)).schema_arrow.names
    y_idx = names.index("y")

    lo, hi = 0, 63  # quarter of the y range
    z_hit = sum(1 for mn, mx in _file_stats(zpath, y_idx) if mx >= lo and mn <= hi)
    z_total = len(_file_stats(zpath, y_idx))
    l_hit = sum(1 for mn, mx in _file_stats(lpath, y_idx) if mx >= lo and mn <= hi)
    l_total = len(_file_stats(lpath, y_idx))

    assert l_hit == l_total  # x-sorted layout: every file intersects
    assert z_hit <= z_total // 2, f"z-order pruned only {z_total - z_hit}/{z_total}"
    # and the data is intact
    assert spark.read.parquet(zpath).count() == 100_000


def test_linear_bucket_bounds(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    out = df.select(
        linear_bucket(F.col("v"), F.lit(0.0), F.lit(100.0), 8).alias("b")
    ).collect()
    bs = [r["b"] for r in out]
    assert bs[0] == 0 and bs[2] == 255 and 0 < bs[1] < 255


def test_global_row_ids_dense_and_deterministic(spark):
    from dlp_rdb_bq_import_spark.operators.layout import global_row_ids

    import pytest as _pytest

    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.col("id").alias("tie")
    )
    out = global_row_ids(df, ["k", "tie"], num_partitions=8)
    rows = [(r.row_id, r.k, r.tie) for r in out.collect()]
    assert sorted(r[0] for r in rows) == list(range(5000))  # dense 0..n-1
    by_order = sorted(rows, key=lambda r: (r[1], r[2]))
    assert [r[0] for r in by_order] == list(range(5000))  # ids follow order
    with _pytest.raises(ValueError):
        global_row_ids(df, [])


def test_prefix_sums_matches_serial_reference(spark):
    """Distributed exclusive/inclusive running sums ≡ a Python fold in
    the same total order — across many partitions, with weights big
    enough that the offsets leave int32 territory."""
    from dlp_rdb_bq_import_spark.operators.layout import prefix_sums

    import pytest as _pytest

    df = spark.range(0, 4000).select(
        (F.col("id") * 97 % 4000).alias("k"),
        (F.col("id") % 1000 * 1_000_003).alias("w"),
    )
    serial = sorted(
        [(r.k, r.w) for r in df.collect()], key=lambda t: t[0]
    )
    run, want_ex, want_in = 0, {}, {}
    for k, w in serial:
        want_ex[k] = run
        run += w
        want_in[k] = run
    for exclusive, want in ((True, want_ex), (False, want_in)):
        out = prefix_sums(
            df, ["k"], "w", out_col="p", exclusive=exclusive, num_partitions=16
        )
        got = {r.k: int(r.p) for r in out.collect()}
        assert got == want, f"exclusive={exclusive}"
    with _pytest.raises(ValueError):
        prefix_sums(df, [], "w")
    with _pytest.raises(ValueError):
        prefix_sums(df.withColumnRenamed("w", "_pid"), ["k"], "k")


def test_encode_categorical_codes_dense_and_null_safe(spark):
    from dlp_rdb_bq_import_spark.operators.layout import encode_categorical

    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "c"), (4, "a"), (5, None)], "id long, v string"
    )
    out = {r.id: r.v_code for r in encode_categorical(df, "v").collect()}
    assert out == {2: 0, 4: 0, 1: 1, 3: 2, 5: None}  # lexicographic, null → null


def test_balanced_file_layout_contracts(spark):
    """Every file except the last holds exactly rows_per_file rows;
    file slices are contiguous in sort order (file k's max key <=
    file k+1's min key); guards reject nonsense sizes."""
    import pytest as _pytest

    from dlp_rdb_bq_import_spark.operators.layout import balanced_file_layout

    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(95)], "id long, k long"
    )
    out = balanced_file_layout(df, ["k", "id"], rows_per_file=10).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(r["file_id"], []).append(r)
    assert sorted(by_file) == list(range(10))
    for fid in range(9):
        assert len(by_file[fid]) == 10
    assert len(by_file[9]) == 5
    # contiguity in (k, id) order across file boundaries
    for fid in range(9):
        assert max((r["k"], r["id"]) for r in by_file[fid]) <= min(
            (r["k"], r["id"]) for r in by_file[fid + 1]
        )
    # ids are dense 0..94
    assert sorted(r["row_id"] for r in out) == list(range(95))
    with _pytest.raises(ValueError):
        balanced_file_layout(df, ["k"], rows_per_file=0)


def _hilbert_ref(x: int, y: int, bits: int) -> int:
    d = 0
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
    return d


def test_hilbert_matches_python_reference(spark):
    from dlp_rdb_bq_import_spark.operators.layout import hilbert_key

    n = 1 << 8
    df = spark.createDataFrame(
        [(i, (i * 37) % n, (i * 101) % n) for i in range(400)],
        "id long, a long, b long",
    )
    out = hilbert_key(df, ["a", "b"], bits=8).collect()
    # buckets are the identity here (values already span 0..255), so
    # the key must equal the reference transform of the raw coords —
    # modulo the linear_bucket edge (max value buckets to n-1)
    for r in out:
        bx = min(int((r.a) * n / (n - 1 + 1e-9)), n - 1)
        by = min(int((r.b) * n / (n - 1 + 1e-9)), n - 1)
        assert r._h == _hilbert_ref(bx, by, 8), (r.a, r.b)


def test_hilbert_unit_steps_are_adjacent_cells():
    """THE property that makes Hilbert beat Morton: walking the curve
    d=0..n²−1 moves exactly one grid cell each step (Morton jumps).
    Verified by inverting: group consecutive d's coordinates."""
    bits = 4
    n = 1 << bits
    coords = {}
    for x in range(n):
        for y in range(n):
            coords[_hilbert_ref(x, y, bits)] = (x, y)
    assert len(coords) == n * n  # bijective on the grid
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = coords[d], coords[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


def test_hilbert_validation(spark):
    from dlp_rdb_bq_import_spark.operators.layout import hilbert_key

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="exactly 2"):
        hilbert_key(df, ["a", "b", "c"])
    with pytest.raises(ValueError, match="bits"):
        hilbert_key(df, ["a", "b"], bits=0)
    with pytest.raises(ValueError, match="reserved"):
        hilbert_key(df.withColumnRenamed("c", "_h"), ["a", "b"])
    with pytest.raises(ValueError, match="no non-null"):
        hilbert_key(
            spark.createDataFrame([(1, None)], "a long, b integer"), ["a", "b"]
        )


def test_hilbert_write_prunes_files_on_secondary_column(spark, tmp_path):
    """Same discriminating setup as the zorder pruning test: filter on
    y only — the Hilbert layout's footer stats must exclude at least
    half the files for a quarter-range predicate."""
    from dlp_rdb_bq_import_spark.operators.layout import hilbert_key

    df = spark.range(100_000).select(
        F.col("id"),
        (F.abs(F.xxhash64("id")) % 256).alias("x"),
        (F.abs(F.xxhash64((F.col("id") + 1_000_000).cast("long"))) % 256).alias("y"),
    )
    hpath = str(tmp_path / "hilbert")
    keyed = hilbert_key(df, ["x", "y"], bits=8)
    keyed.repartitionByRange(16, "_h").write.mode("overwrite").parquet(hpath)

    sample = [f for f in os.listdir(hpath) if f.endswith(".parquet")][0]
    names = pq.ParquetFile(os.path.join(hpath, sample)).schema_arrow.names
    y_idx = names.index("y")
    lo, hi = 0, 63
    stats = _file_stats(hpath, y_idx)
    hit = sum(1 for mn, mx in stats if mx >= lo and mn <= hi)
    assert hit <= len(stats) // 2, f"hilbert pruned only {len(stats) - hit}/{len(stats)}"
    assert spark.read.parquet(hpath).count() == 100_000
