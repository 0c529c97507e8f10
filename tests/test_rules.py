"""Association-rule mining and EWMA smoothing."""

import pytest

from biomedical_data_integration_spark.operators.rules import (
    association_rules,
    frequent_pairs,
)
from biomedical_data_integration_spark.streaming.events import ewma_smooth


def _baskets(spark):
    rows = []
    for b, items in [
        (1, ["beer", "chips", "salsa"]),
        (2, ["beer", "chips"]),
        (3, ["beer", "diapers"]),
        (4, ["chips", "salsa"]),
        (5, ["beer", "chips", "diapers"]),
        (6, ["milk"]),
    ]:
        rows += [(b, i) for i in items]
    return spark.createDataFrame(rows, ["basket", "item"])


def test_frequent_pairs_counts_and_pregate(spark):
    got = {
        (r["item_a"], r["item_b"]): r["pair_support"]
        for r in frequent_pairs(_baskets(spark), "basket", "item").collect()
    }
    assert got[("beer", "chips")] == 3
    assert got[("chips", "salsa")] == 2
    # 'milk' has support 1 -> pruned before the join; no milk pairs
    assert not any("milk" in k for k in got)
    # pairs below min_support dropped (beer+salsa co-occur once)
    assert ("beer", "salsa") not in got


def test_association_rules_confidence_and_lift(spark):
    rules = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(_baskets(spark), "basket", "item").collect()
    }
    r = rules[("chips", "beer")]
    # supp(chips)=4, supp(beer,chips)=3, supp(beer)=4, n_baskets=6
    assert r["pair_support"] == 3
    assert r["confidence"] == pytest.approx(3 / 4, abs=1e-6)
    assert r["lift"] == pytest.approx((3 / 4) / (4 / 6), abs=1e-6)
    # both directions exist
    assert ("beer", "chips") in rules


def test_association_rules_min_confidence_filters(spark):
    rules = association_rules(
        _baskets(spark), "basket", "item", min_confidence=0.9
    ).collect()
    assert all(r["confidence"] >= 0.9 for r in rules)


def test_frequent_pairs_validates(spark):
    with pytest.raises(ValueError):
        frequent_pairs(_baskets(spark), "basket", "item", min_support=0)


def test_ewma_truncated_weights(spark):
    df = spark.createDataFrame(
        [(1, i, i, float(v)) for i, v in enumerate([10, 20, 30])],
        ["user_id", "ts", "event_id", "value"],
    )
    got = {
        r["ts"]: r["ewma"]
        for r in ewma_smooth(df, window=2, alpha=0.5).collect()
    }
    assert got[0] == pytest.approx(10.0, abs=1e-6)  # no history: plain value
    assert got[1] == pytest.approx((20 + 0.5 * 10) / 1.5, abs=1e-6)
    assert got[2] == pytest.approx((30 + 0.5 * 20) / 1.5, abs=1e-6)


def test_ewma_per_key_isolation(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, 100.0), (2, 1, 1, 0.0), (2, 2, 2, 10.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    got = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma_smooth(df, window=4).collect()
    }
    # user 2's smoothing never sees user 1's 100
    assert got[(2, 2)] == pytest.approx((10 + 0.5 * 0) / 1.5, abs=1e-6)


def test_ewma_validates(spark):
    df = spark.createDataFrame([(1, 0, 0, 1.0)], ["user_id", "ts", "event_id", "value"])
    with pytest.raises(ValueError):
        ewma_smooth(df, alpha=0.0)
    with pytest.raises(ValueError):
        ewma_smooth(df, window=0)
