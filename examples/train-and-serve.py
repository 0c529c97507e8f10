"""Train-and-serve walkthrough: the round-10 in-engine training faces.

A production corpus pipeline trains small artifacts ONCE (a tokenizer,
a quality filter, an ANN index) and then serves them as pure
projections / partition-pruned scans over the firehose. This example
runs all three loops end to end on the test corpus:

1. quality filter  — train a logistic model in-engine (centered
   integer full-batch GD), then score the corpus with the serving
   projection (and note: the same model gates an unbounded stream via
   ``streaming_quality_score``);
2. unigram tokenizer — fixed-iteration hard-EM piece vocabulary, then
   whole-corpus segmentation as a pure expression (no Python);
3. ANN serving — build the cell-partitioned IVFPQ index, persist it,
   reload, and probe WITHOUT retraining (the probe plan reads only
   nprobe/n_cells of the files).

Run:  python examples/train-and-serve.py [parquet_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark: SparkSession, sf_dir: str):
    from biomedical_data_integration_spark.operators.bpe import (
        encode_unigram,
        train_unigram,
        word_counts,
    )
    from biomedical_data_integration_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_load,
        ivfpq_save,
        ivfpq_topk,
    )
    from biomedical_data_integration_spark.operators.text import (
        score_quality_classifier,
        train_quality_classifier,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # -- 1. quality filter: train in-engine, serve as a projection -----
    label = (F.col("quality_score") >= 0.66).cast("int")
    model = train_quality_classifier(docs, label, iters=6, lr=10.0)
    scored = score_quality_classifier(docs, model)
    kept = scored.where(F.col("score_micro") >= 500_000)
    print(
        f"quality filter: trained on {model['n']} docs, "
        f"keeps {kept.count()} of {docs.count()}"
    )

    # -- 2. unigram tokenizer: train, then encode as pure expressions --
    usage = train_unigram(
        word_counts(docs), vocab_size=32, iters=2, candidate_pool=64
    )
    print(f"unigram vocab (top 5 of {len(usage)}): {usage[:5]}")
    enc = encode_unigram(docs.limit(3), usage)
    for r in enc.select("doc_id", "unigram_tokens").collect():
        print(f"  doc {r['doc_id']}: {r['unigram_tokens'][:8]} ...")

    # -- 1b. (round 11) persist the trained filter as a model sidecar --
    from biomedical_data_integration_spark.operators.text import (
        load_classifier,
        save_classifier,
    )

    mpath = os.path.join(tempfile.mkdtemp(), "qclf")
    save_classifier(spark, model, mpath)
    served = score_quality_classifier(docs, load_classifier(spark, mpath))
    print(
        "persisted model sidecar serves "
        f"{served.count()} docs without retraining"
    )
    shutil.rmtree(os.path.dirname(mpath), ignore_errors=True)

    # -- 3. ANN: build once, persist, probe without retraining ---------
    corpus = emb.where(F.col("embedding").isNotNull())
    # train on the first half only: the second half arrives "tomorrow"
    idx, cents, cb = ivfpq_index(
        corpus.where("vec_id % 2 = 0"), n_cells=4, m=4, n_codes=8
    )
    path = os.path.join(tempfile.mkdtemp(), "ivfpq")
    ivfpq_save(idx, cents, cb, path)
    # (round 11) incremental ingestion: append the new batch encoded
    # with the FROZEN model — no rebuild, serving unchanged
    from biomedical_data_integration_spark.operators.similarity import (
        ivfpq_append_index,
        ivfpq_probe_many,
    )

    ivfpq_append_index(corpus.where("vec_id % 2 = 1"), path)
    idx2, cents2, cb2 = ivfpq_load(spark, path)
    query = [
        float(x) for x in corpus.where("vec_id = 0").first()["embedding"]
    ]
    hits = ivfpq_topk(idx2, query, cents2, cb2, k=5, nprobe=2)
    print("persisted-index probe over the grown index (no retraining):")
    for r in hits.collect():
        print(f"  vec {r['vec_id']}: adist {r['adist']:.4f}")
    # (round 11) batch probe: a query TABLE in one pruned scan
    queries = corpus.where("vec_id in (0, 2, 4)").selectExpr(
        "vec_id as query_id", "embedding"
    )
    many = ivfpq_probe_many(idx2, queries, cents2, cb2, k=3, nprobe=2)
    print(f"batch probe: {many.count()} rows for 3 queries in one scan")
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return hits


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("train-and-serve")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf)
