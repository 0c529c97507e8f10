"""Skew helpers: salted plans must produce identical results."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.functions.skew import (
    salted_aggregate,
    salted_join,
)


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", i * 1.0) for i in range(900)] + [
        (f"k{i}", i * 1.0) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("missing", "Z")], ["k", "label"]
    )
    plain = skewed.join(dim, ["k"], "inner")
    salted = salted_join(skewed, dim, ["k"], "inner", salts=8)
    assert salted.count() == plain.count() == 901
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_left_join_preserves_unmatched(spark, skewed):
    dim = spark.createDataFrame([("k1", "A")], ["k", "label"])
    out = salted_join(skewed, dim, ["k"], "left", salts=4)
    assert out.count() == 1000
    assert out.where("label is null").count() == 999


def test_salted_join_rejects_right(spark, skewed):
    dim = spark.createDataFrame([("k1", "A")], ["k", "label"])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, ["k"], "right")


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r["k"]): (r["cnt"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["count"], r["sum_v"], r["min_v"], r["max_v"])
        for r in salted_aggregate(
            skewed, ["k"], counts=["*"], sums=["v"], mins=["v"], maxs=["v"], salts=16
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_requires_aggs(spark, skewed):
    with pytest.raises(ValueError, match="at least one"):
        salted_aggregate(skewed, ["k"])
