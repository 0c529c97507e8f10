"""Data-selection walkthrough: three complementary selection objectives.

A 100 TB crawl is never trained on whole; the pipeline picks. This
example runs the engine's three selection primitives side by side and
shows what each optimizes:

1. DSIR importance weights (Xie et al. 2023) — TILT toward a target
   domain: score every raw document by hashed-unigram likelihood ratio
   target-vs-raw.
2. Greedy max-coverage (Nemhauser et al. 1978) — maximize LEXICAL
   diversity: the k documents covering the most distinct word bigrams.
3. Greedy facility location — maximize SEMANTIC coverage: the k
   embedding-space representatives so every vector has a similar
   selected neighbor.

Run:  python examples/data-selection.py [parquet_dir]
(defaults to /root/testdata/sf0.001; expects documents.parquet and
embeddings.parquet inside)
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark: SparkSession, sf_dir: str):
    from biomedical_data_integration_spark.operators.sampling import (
        dsir_weights,
        max_coverage_select,
    )
    from biomedical_data_integration_spark.operators.similarity import (
        facility_location_select,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # 1. DSIR: treat one source as the high-quality target domain and
    #    weight the whole corpus toward it
    target = docs.where(F.col("source") == "src13")
    weighted = dsir_weights(docs, target)
    print("DSIR: top-5 most target-like documents")
    weighted.orderBy(F.desc("avg_log_ratio"), "doc_id").select(
        "doc_id", "avg_log_ratio"
    ).show(5)

    # 2. max-coverage: 5 documents covering the most distinct bigrams
    cov = max_coverage_select(docs, k=5, ngram_n=2)
    print("max-coverage: greedy picks (marginal bigram gains)")
    cov.orderBy("rank").show()

    # 3. facility location: 5 embedding-space representatives
    fl = facility_location_select(emb, k=5, pool=24)
    print("facility location: greedy representatives (micro-unit gains)")
    fl.orderBy("rank").show()

    # The three selections answer different questions; a production
    # pass composes them: DSIR-threshold first (domain fit), then a
    # coverage pick inside the survivors (diversity within budget).
    return cov


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
