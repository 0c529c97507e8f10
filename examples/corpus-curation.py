"""Corpus curation walkthrough: the training-data-pipeline side of the
engine (the README "Pipeline quick-start", runnable end-to-end).

Filters a document corpus by language and model-free quality signals,
drops exact + MinHash-LSH near duplicates, then chunks and packs the
survivors into fixed-token-budget training sequences.

Run:  python examples/corpus-curation.py [parquet_dir]
(defaults to /root/testdata/sf0.001; expects documents.parquet inside)
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark: SparkSession, sf_dir: str):
    """The walkthrough body; returns the packed training sequences."""
    from biomedical_data_integration_spark.operators.dedup import (
        drop_exact_duplicates,
        minhash_lsh_pairs,
    )
    from biomedical_data_integration_spark.operators.text import (
        chunk_documents,
        detect_language,
        lexical_diversity,
        pack_sequences,
        quality_features,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. language gate (stopword-hit heuristic — no model download)
    docs = detect_language(docs).where(F.col("detected_lang") == "en")

    # 2. quality gates: heuristic quality score + lexical diversity (TTR)
    docs = quality_features(docs).where(F.col("quality_score") >= 0.5)
    docs = docs.join(
        lexical_diversity(docs).where(F.col("ttr") >= 0.3).select("doc_id"),
        "doc_id",
    )

    # 3. dedup: exact content hash, then MinHash-LSH near-dup pairs
    #    (drop the HIGHER id of each verified pair — lowest-id survives)
    docs = drop_exact_duplicates(docs, text_col="text", id_col="doc_id")
    near = minhash_lsh_pairs(docs, text_col="text", id_col="doc_id")
    docs = docs.join(
        near.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    n1 = docs.count()
    print(f"curation: {n0} -> {n1} documents after language/quality/dedup")

    # 4. chunk to a token budget and pack chunks into training bins
    chunks = chunk_documents(docs, chunk_tokens=256, overlap=32)
    chunks = chunks.withColumn(
        "chunk_id", F.concat_ws("-", F.col("id"), F.col("chunk_idx"))
    )
    packed = pack_sequences(
        chunks, text_col="chunk_text", id_col="chunk_id", budget_tokens=1024
    )
    print(f"packed {chunks.count()} chunks into "
          f"{packed.select('bucket', 'bin').distinct().count()} bins")
    return packed


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bdi-corpus-curation")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
