"""Distributed PageRank over an edge DataFrame — the domain/source
quality signal a web-scale crawl-curation pipeline ranks with (public
algorithm: Page et al. 1999; no reference counterpart — the reference
has no graph surface).

Spark-first shape: each power iteration is one shuffle — contributions
grouped by destination — plus a broadcast-able join against the
out-degree table computed once up front. Dangling mass (nodes with no
out-edges) is redistributed uniformly each iteration via a single-row
aggregate, so ranks sum to 1 exactly like the textbook formulation.
``localCheckpoint`` after every iteration cuts the lineage chain (the
same discipline as the label-propagation path in
``operators/dedup.py:duplicate_clusters``) — without it, iteration k
replans k stacked shuffles and the job dies long before convergence at
any scale.

At 100 TB the iteration cost is dominated by the contributions shuffle
(|E| rows hashed by dst); skewed in-degree (every web graph) is AQE
skew-split territory, and the rank/degree tables stay |V|-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 20,
) -> DataFrame:
    """Rank every node appearing as src or dst. Returns (node, rank)
    with ranks summing to 1. Parallel edges count as repeated votes
    (pre-aggregate to weights upstream if that is not wanted);
    self-loops are legal. Deterministic: same edges → same ranks."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iterations):
        with_deg = ranks.join(outdeg, "node", "left")
        # mass from dangling nodes (no out-edges) spreads uniformly
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contribs = (
            e.join(
                with_deg.where(F.col("deg").isNotNull()),
                e.src == F.col("node"),
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
