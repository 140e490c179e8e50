"""cooccurrence_pairs: market-basket co-occurrence with exact support/lift."""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.affinity import cooccurrence_pairs

from conftest import rows


@pytest.fixture(scope="module")
def baskets(spark):
    # basket 1: {a, b, c}; basket 2: {a, b}; basket 3: {a}; basket 4: {b, c}
    # (a,b) in 2 baskets, (a,c) in 1, (b,c) in 2; n_baskets = 4
    data = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"), (2, "a"),  # duplicate (2, a) must collapse
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    return spark.createDataFrame(data, ["basket", "item"])


def test_pair_counts_support_lift(baskets):
    out = cooccurrence_pairs(baskets, "basket", "item")
    got = {(r.item_a, r.item_b): r for r in out.collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    assert ab.pair_count == 2 and ab.count_a == 3 and ab.count_b == 3
    # support = 2/4 = 500000 ppm; lift = 2*4/(3*3) = 888888 ppm (floor)
    assert ab.support_ppm == 500_000
    assert ab.lift_ppm == 888_888
    ac = got[("a", "c")]
    assert ac.pair_count == 1 and ac.count_a == 3 and ac.count_b == 2
    assert ac.support_ppm == 250_000
    assert ac.lift_ppm == 666_666


def test_min_pair_count_filters(baskets):
    out = cooccurrence_pairs(baskets, "basket", "item", min_pair_count=2)
    assert {(r.item_a, r.item_b) for r in out.collect()} == {
        ("a", "b"), ("b", "c"),
    }


def test_max_basket_caps_fanout(spark):
    # one 6-item basket capped to 3 keeps items 1,2,3 -> C(3,2)=3 pairs
    data = [(1, i) for i in range(1, 7)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(data, ["basket", "item"])
    out = cooccurrence_pairs(df, "basket", "item", max_basket=3)
    got = {(r.item_a, r.item_b): r.pair_count for r in out.collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_counts_use_capped_set(spark):
    # item 4 only appears beyond the cap -> absent from supports and pairs
    data = [(1, i) for i in range(1, 5)] + [(2, 4)]
    df = spark.createDataFrame(data, ["basket", "item"])
    out = cooccurrence_pairs(df, "basket", "item", max_basket=2)
    items = {r.item_a for r in out.collect()} | {
        r.item_b for r in out.collect()
    }
    assert items == {1, 2}


def test_validation(baskets):
    with pytest.raises(ValueError):
        cooccurrence_pairs(baskets, "basket", "item", min_pair_count=0)
    with pytest.raises(ValueError):
        cooccurrence_pairs(baskets, "basket", "item", max_basket=1)
