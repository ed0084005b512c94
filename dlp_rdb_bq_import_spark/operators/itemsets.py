"""Frequent-itemset mining: pairwise co-occurrence with support
pruning, and directed association rules on top — the market-basket /
feature-co-occurrence primitive.

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

    # the distinct basket-item set feeds the support count AND both
    # sides of the pair self-join — without a lineage cut the
    # scan+distinct replays once per consumer (4 source scans in the
    # executed plan; the association_rules discipline applied here)
    pairs_src = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
        .localCheckpoint(eager=False)
    )

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


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Directed association rules antecedent→consequent from frequent
    pairs: ``antecedent, consequent, support, confidence, lift``.

    confidence = support(a,b) / support(a) and
    lift = support(a,b)·n_baskets / (support(a)·support(b)) — each is
    exact int64 arithmetic widened to double before ONE IEEE division,
    so the floats hash-match any engine evaluating the same expression
    (the ``numeric_correlations`` bit-exactness recipe). Both rule
    directions are emitted for every unordered frequent pair.

    With ``max_basket`` set, mega-baskets are removed from the basket
    universe FIRST and every metric — pair support, item supports,
    n_baskets — is computed over that same capped universe, so
    confidence and lift stay internally consistent (P(b|a) with both
    numerator and denominator over identical baskets).

    Scale shape: the same A-Priori pruned self-join as
    :func:`frequent_item_pairs` (inlined so the distinct basket set and
    item supports are computed once and shared); n_baskets is a scalar
    attached via a broadcast one-row cross join — no new quadratic
    stage.
    """
    reserved = {"antecedent", "consequent", "support", "confidence", "lift",
                "_b", "_bsz", "_i", "_n", "_na", "_nb", "_nc"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")

    # Every metric below (pair support, item supports, n_baskets) is
    # computed over ONE consistent basket universe: the distinct
    # (basket, item) set, minus capped mega-baskets when max_basket is
    # set. (Calling frequent_item_pairs and then recounting supports on
    # the raw input would both rescan the data and mix a capped pair
    # universe with uncapped denominators — confidence/lift would match
    # neither definition.) Lazy localCheckpoints materialize each
    # shared stage once instead of replaying it per consumer.
    baskets = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    if max_basket is not None:
        # the cap counts FREQUENT items (the quantity the pair
        # self-join squares), mirroring frequent_item_pairs
        pre = baskets.groupBy("_i").agg(F.count("*").alias("_n"))
        freq0 = pre.where(F.col("_n") >= min_support).select("_i")
        sizes = (
            baskets.join(freq0, on="_i")
            .groupBy("_b")
            .agg(F.count("*").alias("_bsz"))
        )
        keep = sizes.where(F.col("_bsz") <= max_basket).select("_b")
        baskets = baskets.join(keep, on="_b", how="leftsemi")
    baskets = baskets.localCheckpoint(eager=False)

    item_support = baskets.groupBy("_i").agg(
        F.count("*").cast("long").alias("_n")
    ).localCheckpoint(eager=False)
    frequent = item_support.where(F.col("_n") >= min_support).select("_i")
    pruned = baskets.join(frequent, on="_i").select("_b", "_i")
    left_p = pruned.select("_b", F.col("_i").alias("item_a"))
    right_p = pruned.select("_b", F.col("_i").alias("item_b"))
    pairs = (
        left_p.join(right_p, on="_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= min_support)
        .localCheckpoint(eager=False)
    )
    n_baskets = baskets.select("_b").distinct().agg(
        F.count("*").cast("long").alias("_nb")
    )

    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "support",
        )
    )
    return (
        directed.join(
            item_support.withColumnsRenamed({"_i": "antecedent", "_n": "_na"}),
            "antecedent",
        )
        .join(
            item_support.withColumnsRenamed({"_i": "consequent", "_n": "_nc"}),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            (F.col("support").cast("double") / F.col("_na").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("support") * F.col("_nb")).cast("double")
                / (F.col("_na") * F.col("_nc")).cast("double")
            ).alias("lift"),
        )
    )
