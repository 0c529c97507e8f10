"""Diverse retrieval walkthrough: ANN candidates + MMR reranking.

A plain cosine top-k over an embedding corpus loves near-duplicates —
ask for 5 neighbors of a popular query and you get 5 paraphrases of the
same document. This example retrieves a candidate pool per query, then
reranks it with maximal marginal relevance (Carbonell & Goldberg,
SIGIR'98) so the final k trade relevance against redundancy — the shape
used for few-shot exemplar selection, RAG context assembly, and
per-cluster representative picking during curation.

Run:  python examples/diverse-retrieval.py [parquet_dir]
(defaults to /root/testdata/sf0.001; expects embeddings.parquet inside)
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark: SparkSession, sf_dir: str):
    """The walkthrough body; returns the diversified top-k."""
    from biomedical_data_integration_spark.operators.similarity import (
        cosine_topk,
        mmr_topk,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") % 100 == 0)

    # 1. the baseline: exact cosine top-5 (broadcast queries over the
    #    partitioned corpus scan — swap in ivf_topk / hyperplane_lsh_topk
    #    for candidate generation at corpus scale)
    plain = cosine_topk(queries, emb, k=5)

    # 2. MMR: top-15 candidate pool, greedy rerank at lambda=0.7
    #    (1.0 = pure relevance, 0.0 = pure diversity)
    diverse = mmr_topk(queries, emb, k=5, pool=15, lam=0.7)

    # 3. measure what the rerank bought: mean pairwise cosine among each
    #    query's picks (lower = less redundant context)
    def redundancy(picks):
        pool = picks.select(
            "query_id", F.col("neighbor_id").alias("id")
        ).join(emb.select(F.col("vec_id").alias("id"), "embedding"), "id")
        a = pool.select(
            "query_id", F.col("id").alias("ia"), F.col("embedding").alias("va")
        )
        b = pool.select(
            "query_id", F.col("id").alias("ib"), F.col("embedding").alias("vb")
        )
        pairs = a.join(b, "query_id").where("ia < ib")
        # the package's cosine helper (zero-norm guarded), not a re-fold
        from biomedical_data_integration_spark.functions.vectors import cosine

        return (
            pairs.select(cosine(F.col("va"), F.col("vb")).alias("s"))
            .agg(F.avg("s"))
            .first()[0]
        )

    print(f"mean pairwise sim  plain top-5: {redundancy(plain):.4f}")
    print(f"mean pairwise sim  MMR top-5  : {redundancy(diverse):.4f}")
    print("\ndiversified picks (first 10 rows):")
    diverse.orderBy("query_id", "rank").show(10)
    return diverse


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf_dir)
