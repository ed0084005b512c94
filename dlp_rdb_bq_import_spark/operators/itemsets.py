"""Frequent-itemset mining: pairwise co-occurrence with support
pruning — the market-basket / feature-co-occurrence primitive.

No reference counterpart (the reference delegates all analytics); this
is north-star surface for corpus analysis (tag/domain co-occurrence,
template detection, recommender candidate generation).

Scale shape — the A-Priori pruning is what keeps 100 TB feasible:
1. one groupBy(item) pass counts per-item support; items below
   ``min_support`` CANNOT appear in a frequent pair (anti-monotone), so
   they are dropped BEFORE any pair is generated;
2. surviving (basket, item) rows self-join per basket with ``a < b``
   ordering — work is Σ|basket'|² over *pruned* baskets, never a global
   cross product;
3. one groupBy(pair) with partial aggregation counts co-occurrence.

A pathological mega-basket makes step 2 quadratic in that basket; cap
with ``max_basket``: baskets whose FREQUENT-item count (post-prune —
that is the quantity the self-join squares) exceeds it are dropped, the
standard practice since a basket touching everything carries no signal.
Surface dropped baskets with profiling.skew_report on the basket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_item_pairs(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Item pairs co-occurring in at least ``min_support`` baskets.

    Output: ``item_a, item_b, support (long)`` with ``item_a < item_b``
    (each unordered pair appears once). Duplicate (basket, item) rows
    count once — co-occurrence is set semantics, the standard
    definition.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    reserved = {"item_a", "item_b", "support", "_n", "_bsz"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")

    pairs_src = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()

    # A-Priori prune: an item in < min_support baskets cannot be in a
    # frequent pair. Keeps the per-basket self-join off the long tail.
    item_support = pairs_src.groupBy("_i").agg(F.count("*").alias("_n"))
    frequent_items = item_support.where(F.col("_n") >= min_support).select("_i")
    pruned = pairs_src.join(frequent_items, on="_i").select("_b", "_i")

    if max_basket is not None:
        sizes = pruned.groupBy("_b").agg(F.count("*").alias("_bsz"))
        pruned = (
            pruned.join(sizes.where(F.col("_bsz") <= max_basket), on="_b")
            .select("_b", "_i")
        )

    left = pruned.select("_b", F.col("_i").alias("item_a"))
    right = pruned.select("_b", F.col("_i").alias("item_b"))
    return (
        left.join(right, on="_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
