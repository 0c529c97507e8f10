"""Column embedders: serialization, sampling strategies, determinism."""

import pytest

from biomedical_data_integration_spark.models import (
    HashingColumnEmbedder,
    HashingTextEmbedder,
)
from pyspark.sql import functions as F


def _table(spark):
    rows = [(f"v{i:02d}", f"w{i % 5}") for i in range(40)]
    return spark.createDataFrame(rows, ["many", "few"])


def test_serialized_columns_head(spark):
    df = _table(spark)
    ser = {
        r["column_name"]: r["serialized"]
        for r in HashingColumnEmbedder(sample_values=3).serialized_columns(df).collect()
    }
    assert ser["many"] == "many v00 v01 v02"          # 3 smallest distinct
    assert ser["few"] == "few w0 w1 w2"


def test_serialized_columns_frequent(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["x"])
    emb = HashingColumnEmbedder(sample_values=2, sample_strategy="frequent")
    ser = emb.serialized_columns(df).first()["serialized"]
    assert ser == "x a b"


def test_serialized_columns_constant_strides(spark):
    df = spark.createDataFrame([(f"v{i:02d}",) for i in range(30)], ["x"])
    emb = HashingColumnEmbedder(sample_values=3, sample_strategy="constant")
    ser = emb.serialized_columns(df).first()["serialized"]
    # 30 distinct / 3 -> stride 10: v00, v10, v20
    assert ser == "x v00 v10 v20"


def test_serialized_columns_random_is_stable(spark):
    df = _table(spark)
    emb = HashingColumnEmbedder(sample_values=5, sample_strategy="random")
    a = {r["column_name"]: r["serialized"] for r in emb.serialized_columns(df).collect()}
    b = {
        r["column_name"]: r["serialized"]
        for r in emb.serialized_columns(df.repartition(13)).collect()
    }
    assert a == b  # partition-invariant "random" sample


def test_unknown_strategy_raises():
    with pytest.raises(ValueError, match="sample_strategy"):
        HashingColumnEmbedder(sample_strategy="bogus")


def test_all_null_column_still_embedded(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a int, b string")
    out = {r["column_name"] for r in HashingColumnEmbedder().column_embeddings(df).collect()}
    assert out == {"a", "b"}


def test_embeddings_l2_normalized_and_deterministic(spark):
    df = spark.createDataFrame([("apple",), ("banana",)], ["fruit"])
    emb = HashingColumnEmbedder()
    a = emb.column_embeddings(df).first()["embedding"]
    b = emb.column_embeddings(df).first()["embedding"]
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9


def test_text_embedder_similar_strings_closer(spark):
    df = spark.createDataFrame(
        [("orange", "oorange", "zebra")], ["a", "b", "c"]
    )
    e = HashingTextEmbedder()
    from biomedical_data_integration_spark.functions.vectors import cosine

    row = df.select(
        cosine(e.embed_expr(F.col("a")), e.embed_expr(F.col("b"))).alias("close"),
        cosine(e.embed_expr(F.col("a")), e.embed_expr(F.col("c"))).alias("far"),
    ).first()
    assert row["close"] > row["far"]
