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


def test_write_training_shards_balanced_and_deterministic(spark, tmp_path):
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.sources.writers import (
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, shard_tokens=5_000)
    # ~28k corpus tokens / 5k budget -> ~6 shards
    assert 3 <= len(manifest) <= 12
    assert sum(m["n_docs"] for m in manifest) == docs.count()
    total_tokens = sum(m["n_tokens"] for m in manifest)
    assert total_tokens > 0
    # hash sharding balances tokens (loose bound: no shard > 3x the mean)
    mean = total_tokens / len(manifest)
    assert all(m["n_tokens"] < 3 * mean for m in manifest)

    # read-back: shard partitioning prunes, n_tokens stored per row
    back = spark.read.parquet(out)
    assert "n_tokens" in back.columns and "shard" in back.columns
    one = back.where(F.col("shard") == manifest[0]["shard"])
    assert one.count() == manifest[0]["n_docs"]

    # manifest JSON round-trips
    mf = spark.read.json(f"{out}/_manifest")
    assert mf.count() == len(manifest)

    # deterministic: a rewrite assigns every doc to the same shard
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, shard_tokens=5_000)
    a = {(r["doc_id"], r["shard"]) for r in spark.read.parquet(out)
         .select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"]) for r in spark.read.parquet(out2)
         .select("doc_id", "shard").collect()}
    assert a == b


def test_stateless_text_ops_compile_on_streams(spark, tmp_path):
    """chunk_documents / detect_language / materialize are stateless
    projections, so the same plan builders run unchanged on a streaming
    DataFrame — the batch face is the stream's backfill."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        chunk_documents,
        detect_language,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog go to the market"),
         (2, "el perro y el gato en la casa es que un dia")],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "in")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    ckpt = str(tmp_path / "ckpt")
    sq = (
        detect_language(chunk_documents(stream, chunk_tokens=8, overlap=2)
                        .withColumnRenamed("chunk_text", "text"))
        .writeStream.format("memory").queryName("chunk_stream_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt).start()
    )
    sq.processAllAvailable()
    sq.stop()
    got = spark.sql("select * from chunk_stream_test").collect()
    want = detect_language(
        chunk_documents(docs, chunk_tokens=8, overlap=2)
        .withColumnRenamed("chunk_text", "text")
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    langs = {r["id"]: r["detected_lang"] for r in got}
    assert langs[1] == "en" and langs[2] == "es"


def test_read_text_corpus_jsonl(spark, tmp_path):
    import json as _json

    from biomedical_data_integration_spark.sources.readers import (
        read_text_corpus,
    )

    p = tmp_path / "corpus.jsonl"
    rows = [
        {"id": 1, "text": "first document"},
        {"id": 2, "text": "second document"},
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    out = read_text_corpus(
        spark, str(p), format="jsonl", id_field="id", source="webcrawl"
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [
        (1, "first document", "webcrawl"),
        (2, "second document", "webcrawl"),
    ]
    # content-addressed ids when no id field: stable and distinct
    auto = read_text_corpus(spark, str(p), format="jsonl")
    ids = [r["doc_id"] for r in auto.collect()]
    assert len(set(ids)) == 2
    again = [r["doc_id"] for r in read_text_corpus(spark, str(p)).collect()]
    assert sorted(ids) == sorted(again)


def test_read_text_corpus_text_dir(spark, tmp_path):
    from biomedical_data_integration_spark.sources.readers import (
        read_text_corpus,
    )

    (tmp_path / "a.txt").write_text("doc a body")
    (tmp_path / "b.txt").write_text("doc b body\nwith two lines")
    out = read_text_corpus(spark, str(tmp_path), format="text")
    got = {r["text"] for r in out.collect()}
    assert got == {"doc a body", "doc b body\nwith two lines"}
    assert out.select("doc_id").distinct().count() == 2


def test_read_text_corpus_validates(spark, tmp_path):
    import pytest as _pytest

    from biomedical_data_integration_spark.sources.readers import (
        read_text_corpus,
    )

    p = tmp_path / "c.jsonl"
    p.write_text('{"body": "x"}')
    with _pytest.raises(ValueError, match="not in"):
        read_text_corpus(spark, str(p), format="jsonl", text_field="text")
    with _pytest.raises(ValueError, match="unknown format"):
        read_text_corpus(spark, str(p), format="avro")


def test_read_text_corpus_string_ids_hashed_not_nulled(spark, tmp_path):
    import json as _json

    from biomedical_data_integration_spark.sources.readers import (
        read_text_corpus,
    )

    p = tmp_path / "strid.jsonl"
    rows = [
        {"id": "doc-alpha", "text": "first"},
        {"id": "doc-beta", "text": "second"},
        {"id": "doc-gamma", "text": "third"},
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    out = read_text_corpus(spark, str(p), format="jsonl", id_field="id")
    ids = [r["doc_id"] for r in out.collect()]
    # non-numeric ids hash to distinct bigints instead of all becoming
    # NULL (which would collide every document downstream)
    assert all(i is not None for i in ids)
    assert len(set(ids)) == 3
    again = [r["doc_id"] for r in read_text_corpus(
        spark, str(p), format="jsonl", id_field="id"
    ).collect()]
    assert sorted(ids) == sorted(again)  # stable across re-ingests
    with __import__("pytest").raises(ValueError, match="missing_id"):
        read_text_corpus(spark, str(p), format="jsonl", id_field="missing_id")
