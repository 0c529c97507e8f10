"""Embedding cache memoization + sink writers."""

import os

from biomedical_data_integration_spark.models import HashingColumnEmbedder
from biomedical_data_integration_spark.models.cache import (
    EmbeddingCache,
    table_fingerprint,
)
from biomedical_data_integration_spark.sources.writers import (
    write_csv,
    write_parquet,
)


def test_fingerprint_partition_invariant(spark):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], ["id", "v"])
    a = table_fingerprint(df)
    b = table_fingerprint(df.repartition(7))
    assert a == b
    c = table_fingerprint(df.where("id < 50"))
    assert c != a
    # column subset changes the fingerprint
    assert table_fingerprint(df, ["id"]) != a


def test_embedding_cache_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("x", 1), ("y", 2)], ["name", "n"])
    cache = EmbeddingCache(base_dir=str(tmp_path), embedder_key="hash32")
    emb = HashingColumnEmbedder()
    first = cache.get_or_compute(df, emb).collect()
    # second call must hit the parquet cache (marker exists)
    fp = table_fingerprint(df)
    assert os.path.exists(os.path.join(str(tmp_path), "hash32", fp, "_SUCCESS"))

    class Exploding:
        def column_embeddings(self, df, columns=None):
            raise AssertionError("cache miss: embedder should not run")

    second = cache.get_or_compute(df, Exploding()).collect()
    assert {r["column_name"] for r in first} == {r["column_name"] for r in second}
    a = {r["column_name"]: r["embedding"] for r in first}
    b = {r["column_name"]: r["embedding"] for r in second}
    assert a == b


def test_writers_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    pq = str(tmp_path / "out_parquet")
    write_parquet(df, pq, partition_by=["v"], max_records_per_file=1000)
    back = spark.read.parquet(pq)
    assert {tuple(r) for r in back.select("id", "v").collect()} == {(1, "a"), (2, "b")}

    csv = str(tmp_path / "out_csv")
    write_csv(df, csv)
    back_csv = spark.read.option("header", "true").csv(csv)
    assert back_csv.count() == 2


def test_fasttext_method_name_resolves(spark):
    from biomedical_data_integration_spark import match_values

    src = spark.createDataFrame([("apple",)], ["x"])
    tgt = spark.createDataFrame([("apple",), ("pear",)], ["y"])
    out = match_values(src, tgt, [("x", "y")], method="fasttext").collect()
    assert out[0]["target_value"] == "apple"


def test_bucketed_table_join_has_no_exchange(spark, tmp_path):
    """Same-key same-count bucketed tables sort-merge join with NO
    Exchange on either side — the co-located-join layout for repeated
    100 TB joins."""
    from biomedical_data_integration_spark.sources.writers import (
        write_bucketed_table,
    )

    a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
    try:
        write_bucketed_table(
            a, "bt_a", ["k"], num_buckets=8, sort_by=["k"],
            mode="overwrite", path=str(tmp_path / "bt_a"),
        )
        write_bucketed_table(
            b, "bt_b", ["k"], num_buckets=8, sort_by=["k"],
            mode="overwrite", path=str(tmp_path / "bt_b"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
            assert joined.count() == 1000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # no shuffle on either side of the sort-merge join
            assert "Exchange hashpartitioning" not in plan
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
