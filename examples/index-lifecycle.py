"""Persisted-index lifecycle walkthrough: the round-12 maintenance faces.

A production retrieval index is not built once — it ingests daily
batches, accumulates small files, loses documents to takedowns, and
replaces stale versions. This example runs the COMPLETE lifecycle on a
persisted BM25 index (the IVFPQ index has the same five faces):

1. build    — tokenize once, postings partitioned by term bucket,
              stats sidecar written LAST (the completion marker);
2. append   — tokenize ONLY the new batch, exact-bigint stats
              recombination (serves bit-identically to a one-pass
              build), crash-bracketed by an _APPEND_PENDING marker
              with an atomic stats swap;
3. compact  — rewrite only the FRAGMENTED bucket partitions (N appends
              leave N part files each) back to one file via
              per-partition atomic renames; probes hash-equal
              before/after;
4. delete   — the FAISS remove_ids contract: anti-join rewrite of only
              the affected partitions + exact stats decrement; equals
              rebuild-without-the-deleted bit-for-bit;
5. upsert   — replace-or-insert as delete + frozen-hash append; equals
              rebuild-with-replacement.

Run:  python examples/index-lifecycle.py [parquet_dir]
(defaults to /root/testdata/sf0.001)
"""

import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _files_per_bucket(path: str) -> dict:
    return {
        os.path.basename(b): len(glob.glob(os.path.join(b, "*.parquet")))
        for b in glob.glob(os.path.join(path, "postings", "bucket=*"))
    }


def run(spark: SparkSession, sf_dir: str):
    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_append_index,
        bm25_compact_index,
        bm25_delete_ids,
        bm25_save_index,
        bm25_search_persisted,
        bm25_upsert_docs,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    base = tempfile.mkdtemp()
    path = os.path.join(base, "bm25")
    query = "spark window join customer"

    # -- 1. build on the first third, 2. append the rest in two batches
    bm25_save_index(docs.where("doc_id % 3 = 0"), path, n_buckets=16)
    bm25_append_index(docs.where("doc_id % 3 = 1"), path)
    bm25_append_index(docs.where("doc_id % 3 = 2"), path)
    stats = spark.read.parquet(f"{path}/stats").first()
    print(
        f"built + 2 appends: {stats['n_docs']} docs, avgdl "
        f"{stats['avgdl']:.2f}"
    )

    # -- 3. compact: appends fragmented the bucket partitions ----------
    frag = _files_per_bucket(path)
    print(f"max part files per bucket before compact: {max(frag.values())}")
    before = bm25_search_persisted(spark, path, query, top_k=10).collect()
    compacted = bm25_compact_index(spark, path)
    after = bm25_search_persisted(spark, path, query, top_k=10).collect()
    print(
        f"compacted {len(compacted)} buckets to 1 file each; probe "
        f"identical: {[tuple(r) for r in after] == [tuple(r) for r in before]}"
    )

    # -- 4. delete: remove a residue class, stats decrement exactly ----
    doomed = [r[0] for r in
              docs.where("doc_id % 11 = 5").select("doc_id").collect()]
    res = bm25_delete_ids(spark, path, doomed)
    print(
        f"deleted {res['n_docs_removed']} docs (rewrote "
        f"{len(res['buckets_rewritten'])} of 16 buckets)"
    )

    # -- 5. upsert: replace surviving docs' text in place --------------
    batch = docs.where("doc_id % 9 = 4 and doc_id % 11 <> 5").select(
        "doc_id", F.concat(F.col("text"), F.lit(" upserted")).alias("text")
    )
    res = bm25_upsert_docs(batch, path)
    print(f"upserted {batch.count()} docs ({res['n_docs_removed']} replaced)")
    hits = bm25_search_persisted(spark, path, "upserted", top_k=3)
    print("top hits for the upserted token:")
    for r in hits.collect():
        print(f"  doc {r['doc_id']}: score {r['score']:.3f}")
    shutil.rmtree(base, ignore_errors=True)
    return hits


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("index-lifecycle")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf)
