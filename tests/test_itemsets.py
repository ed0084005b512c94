"""Unit tests for itemsets.frequent_item_pairs: planted co-occurrence,
set semantics, A-Priori pruning effect, basket cap, and guards."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from dlp_rdb_bq_import_spark.operators.itemsets import frequent_item_pairs


def _baskets(spark, rows):
    return spark.createDataFrame([Row(bk=b, it=i) for b, i in rows])


def test_planted_pairs_and_ordering(spark):
    # items 1,2 together in 3 baskets; 1,3 in 1 basket
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2), (13, 1), (13, 3)]
    out = frequent_item_pairs(
        _baskets(spark, rows), basket_col="bk", item_col="it", min_support=2
    ).collect()
    assert [(r["item_a"], r["item_b"], r["support"]) for r in out] == [(1, 2, 3)]


def test_duplicate_item_in_basket_counts_once(spark):
    rows = [(10, 1), (10, 1), (10, 2), (11, 1), (11, 2)]
    out = frequent_item_pairs(
        _baskets(spark, rows), basket_col="bk", item_col="it", min_support=2
    ).collect()
    assert [(r["item_a"], r["item_b"], r["support"]) for r in out] == [(1, 2, 2)]


def test_apriori_prune_matches_unpruned_semantics(spark):
    # item 9 appears once -> pruned before pairing; result identical to
    # brute force (support filter would drop its pairs anyway)
    rows = [(1, 1), (1, 2), (1, 9), (2, 1), (2, 2)]
    out = frequent_item_pairs(
        _baskets(spark, rows), basket_col="bk", item_col="it", min_support=2
    ).collect()
    assert [(r["item_a"], r["item_b"], r["support"]) for r in out] == [(1, 2, 2)]


def test_max_basket_drops_mega_basket(spark):
    # every mega-basket item appears in 2 baskets, so none is pruned:
    # the mega basket keeps 7 frequent items and exceeds max_basket=5.
    mega = [(99, i) for i in range(1, 8)] + [(98, i) for i in range(1, 8)]
    rows = [(1, 1), (1, 2), (2, 1), (2, 2)] + mega
    out = frequent_item_pairs(
        _baskets(spark, rows),
        basket_col="bk",
        item_col="it",
        min_support=2,
        max_basket=5,
    ).collect()
    # both mega baskets excluded -> only the planted pair remains
    assert [(r["item_a"], r["item_b"], r["support"]) for r in out] == [(1, 2, 2)]


def test_max_basket_counts_frequent_items_only(spark):
    # items 3..9 are singletons (pruned); the basket's frequent-item
    # count is 2, under the cap, so its pair survives.
    rows = [(1, 1), (1, 2), (2, 1), (2, 2)] + [(1, i) for i in range(3, 10)]
    out = frequent_item_pairs(
        _baskets(spark, rows),
        basket_col="bk",
        item_col="it",
        min_support=2,
        max_basket=5,
    ).collect()
    assert [(r["item_a"], r["item_b"], r["support"]) for r in out] == [(1, 2, 2)]


def test_min_support_guard(spark):
    with pytest.raises(ValueError, match="min_support"):
        frequent_item_pairs(
            _baskets(spark, [(1, 1)]), basket_col="bk", item_col="it", min_support=0
        )


def test_reserved_name_guard(spark):
    df = _baskets(spark, [(1, 1)]).withColumnRenamed("it", "support")
    with pytest.raises(ValueError, match="reserved"):
        frequent_item_pairs(df, basket_col="bk", item_col="support")


# ---------------------------------------------------------------------------
# association_rules
# ---------------------------------------------------------------------------

from dlp_rdb_bq_import_spark.operators.itemsets import association_rules  # noqa: E402


def test_rules_hand_computed_confidence_and_lift(spark):
    # 4 baskets; {1,2} together in 3; item 1 in 4, item 2 in 3.
    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 2),
        (13, 1),
    ]
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(
            _baskets(spark, rows), basket_col="bk", item_col="it", min_support=2
        ).collect()
    }
    assert set(out) == {(1, 2), (2, 1)}
    r12, r21 = out[(1, 2)], out[(2, 1)]
    assert r12["support"] == 3 and r21["support"] == 3
    assert r12["confidence"] == 3 / 4          # P(2 | 1)
    assert r21["confidence"] == 3 / 3          # P(1 | 2)
    # lift identical in both directions: 3*4 / (4*3) = 1.0
    assert r12["lift"] == 1.0 and r21["lift"] == 1.0


def test_rules_lift_above_one_for_correlated_items(spark):
    # items 5,6 always together (2 baskets of 6 total) -> lift = 2*6/(2*2) = 3
    rows = [(i, 9) for i in range(1, 7)] + [(1, 5), (1, 6), (2, 5), (2, 6)]
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(
            _baskets(spark, rows), basket_col="bk", item_col="it", min_support=2
        ).collect()
    }
    assert out[(5, 6)]["lift"] == 3.0
    assert out[(5, 6)]["confidence"] == 1.0


def test_rules_reserved_name_guard(spark):
    df = _baskets(spark, [(1, 1)]).withColumnRenamed("it", "lift")
    with pytest.raises(ValueError, match="reserved"):
        association_rules(df, basket_col="bk", item_col="lift")


def test_rules_max_basket_metrics_share_one_universe(spark):
    # mega basket 99 holds 3 frequent items; with max_basket=2 it is dropped
    # from the UNIVERSE, so support, confidence, lift all describe the
    # same 4 surviving baskets.
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"),
        (99, "a"), (99, "b"), (99, "c"), (99, "d"),
    ]
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(
            _baskets(spark, rows), basket_col="bk", item_col="it",
            min_support=2, max_basket=2,
        ).collect()
    }
    r = out[("b", "a")]
    # capped universe: a in {1,2,3}, b in {1,2}, pair in {1,2}, 4 baskets
    assert r["support"] == 2
    assert r["confidence"] == 2 / 2
    assert r["lift"] == (2 * 4) / (2 * 3)
