"""Similarity search over embedding columns (``array<float>``).

Two paths (BASELINE.json north star):
- ``brute_force_topk`` — exact cosine top-k. The small (query) side is
  broadcast, so the big side streams through one stage with no shuffle;
  per-pair dot products run as JVM higher-order functions. Exact path
  doubles as the recall oracle for the approximate path.
- ``lsh_topk`` — random-hyperplane (sign) LSH: bucket by a b-bit sign
  signature, probe only same-bucket (and optionally neighboring-band)
  candidates. At 100 TB the bucket join replaces the docs×queries cross
  product; hyperplanes derive deterministically from (plane, dim) hashes
  so there is no RNG state to ship.

Numeric determinism: float components are quantized to integers
(``round(x * 1e7)`` — a deterministic double op) and dot products /
norms accumulate in exact 64-bit integer arithmetic, which is
order-independent — so cosine values are bit-identical across Spark and
the DuckDB oracle regardless of partitioning or summation order. The
quantization (~1e-7 relative) defines the metric; both sides compute
the *same* metric exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

QUANT_SCALE = 10_000_000  # 1e7: float32 has ~7 significant digits


def _quantize(v):  # Column -> Column (array<long>)
    return F.transform(
        v, lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("long")
    )


def _int_dot(a, b):  # Column(array<long>) x2 -> Column(long)
    """Exact integer dot product via fold — order-independent because
    integer addition is associative and exact."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def with_norm(df: DataFrame, vec_col: str, out: str = "_norm") -> DataFrame:
    """Adds quantized vector ``_qv`` and double norm ``out`` (in
    quantized units)."""
    q = _quantize(F.col(vec_col))
    return df.withColumn("_qv", q).withColumn(
        out, F.sqrt(_int_dot(F.col("_qv"), F.col("_qv")).cast("double"))
    )


def cosine_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All (query, corpus) cosine similarities; query side broadcast."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("qid"), F.col("_qv").alias("_qvq"), F.col("_norm").alias("_qn")
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nid"), F.col("_qv").alias("_cvq"), F.col("_norm").alias("_cn")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("nid"))
        .withColumn(
            "cosine",
            F.round(
                _int_dot(F.col("_qvq"), F.col("_cvq")).cast("double")
                / (F.col("_qn") * F.col("_cn")),
                9,
            ),
        )
        .select("qid", "nid", "cosine")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (ties broken by neighbor id —
    deterministic output)."""
    pairs = cosine_pairs(queries, corpus, vec_col, id_col)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t)."""
    a = with_norm(df, vec_col).select(
        F.col(id_col).alias("id_a"), F.col("_qv").alias("_va"), F.col("_norm").alias("_na")
    )
    b = with_norm(df, vec_col).select(
        F.col(id_col).alias("id_b"), F.col("_qv").alias("_vb"), F.col("_norm").alias("_nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                _int_dot(F.col("_va"), F.col("_vb")).cast("double")
                / (F.col("_na") * F.col("_nb")),
                9,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Approximate path: random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, bits: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: entry (i, j) from a
    splitmix64-style integer mix of (i, j) — no RNG state, same planes on
    every executor and every run."""
    idx = (np.arange(bits, dtype=np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
           + np.arange(dim, dtype=np.uint64)[None, :] * np.uint64(0xBF58476D1CE4E5B9))
    z = idx
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    # map to (-0.5, 0.5) uniformly
    return (z.astype(np.float64) / 2**64) - 0.5


def sign_lsh_signatures(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", bits: int = 16
) -> DataFrame:
    """b-bit sign signature per vector (vectorized numpy matmul in Arrow
    batches)."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    planes = _hyperplanes(dim, bits)

    schema = T.StructType(
        [T.StructField("_id", T.LongType()), T.StructField("bucket", T.LongType())]
    )

    def sig(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"_id": [], "bucket": []})
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = mat @ planes.T  # (n, bits)
            buckets = ((proj >= 0).astype(np.uint64) << np.arange(bits, dtype=np.uint64)).sum(axis=1)
            yield pd.DataFrame({"_id": pdf[id_col].astype("int64"), "bucket": buckets.astype("int64")})

    return (
        df.select(F.col(id_col).cast("long").alias(id_col), vec_col)
        .mapInPandas(sig, schema=schema)
        .withColumnRenamed("_id", id_col)
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates = same-bucket vectors, then exact
    cosine rerank of candidates only. Equi-join on bucket replaces the
    cross join; recall measured against ``brute_force_topk`` in tests."""
    qs = sign_lsh_signatures(queries, vec_col, id_col, bits).withColumnRenamed(id_col, "qid")
    cs = sign_lsh_signatures(corpus, vec_col, id_col, bits).withColumnRenamed(id_col, "nid")
    cand = qs.join(cs, "bucket").where(F.col("qid") != F.col("nid")).select("qid", "nid")

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("qid"), F.col("_qv").alias("_qvq"), F.col("_norm").alias("_qn")
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nid"), F.col("_qv").alias("_cvq"), F.col("_norm").alias("_cn")
    )
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(c, "nid")
        .withColumn(
            "cosine",
            F.round(
                _int_dot(F.col("_qvq"), F.col("_cvq")).cast("double")
                / (F.col("_qn") * F.col("_cn")),
                9,
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )
