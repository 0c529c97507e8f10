"""The canonical web-corpus curation rule sets, composed end to end
(round 9): C4 line/page cleaning (Raffel et al. JMLR'20), the Gopher
document gates and FULL repetition suite with published thresholds
(Rae et al. 2021), exact-substring span removal (Lee et al. ACL'22),
and UniMax language-budget allocation (Chung et al. ICLR'23).

Every stage is a pure Spark plan; the whole pipeline composes into one
DAG with no intermediate actions. The same operators compile onto
Structured Streaming frames (gopher_rules / c4_clean / pq_encode are
stateless projections — see tests/test_streaming_round5.py).

Run:  python examples/web-curation-rules.py [parquet_dir]
(defaults to /root/testdata/sf0.001; expects documents.parquet inside)
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biomedical_data_integration_spark.operators.dedup import (  # noqa: E402
    remove_duplicate_spans,
)
from biomedical_data_integration_spark.operators.sampling import (  # noqa: E402
    unimax_allocation,
)
from biomedical_data_integration_spark.operators.text import (  # noqa: E402
    c4_clean,
    gopher_repetition,
    gopher_rules,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # the synthetic corpus is single-line and unpunctuated; stage
    # deterministic sentence breaks so the line rules have lines to judge
    docs = docs.withColumn(
        "text", F.regexp_replace("text", " (join|sort) ", ".\n")
    )
    n0 = docs.count()

    # 1. C4: line filter + page gates
    c4 = (
        c4_clean(docs)
        .where("keep_c4")
        .select("doc_id", F.col("text_clean").alias("text"), "lang", "source")
    )
    n1 = c4.count()

    # 2. Gopher document gates (skip the stop-word gate — synthetic vocab)
    g = (
        gopher_rules(c4, min_words=20)
        .where("flag_word_count AND flag_mean_word_len AND flag_alpha_words")
        .select("doc_id", "text", "lang", "source")
    )
    n2 = g.count()

    # 3. Gopher repetition suite (shuffle-free sorted-run folds)
    rep = gopher_repetition(g, top_ngrams=(2,), dup_ngrams=(5,))
    kept = g.join(
        rep.where(
            "flag_top_2_gram_char_frac AND flag_dup_5_gram_char_frac"
        ).select("doc_id"),
        "doc_id",
        "leftsemi",
    )
    n3 = kept.count()

    # 4. exact-substring span removal (Lee et al.)
    spans = remove_duplicate_spans(kept, shingle_words=5)
    n_affected = spans.where("n_removed > 0").count()

    # 5. UniMax: fair per-language budget for the survivors
    alloc = unimax_allocation(kept, total_budget=8_000, max_epochs=2)

    print(f"input documents        : {n0}")
    print(f"after C4 page gates    : {n1}")
    print(f"after Gopher gates     : {n2}")
    print(f"after repetition gate  : {n3}")
    print(f"span-dedup touched     : {n_affected}")
    print("UniMax allocation:")
    for r in alloc.orderBy("lang").collect():
        print(
            f"  {r['lang']}: {r['tokens_total']} tokens -> "
            f"{r['alloc_tokens']:.0f} allocated ({r['epochs']:.3f} epochs,"
            f" capped={r['capped']})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
