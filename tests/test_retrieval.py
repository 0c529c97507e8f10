"""BM25 full-text search and reciprocal-rank-fusion hybrid retrieval."""

import math

from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_postings,
    bm25_search,
    rrf_fuse,
    tokenize_query,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the lazy dog sleeps all day long"),
            (3, "a quick brown rabbit runs past the fox den"),
            (4, "stock markets fell sharply on quarterly reports"),
            (5, "fox fox fox"),
        ],
        ["doc_id", "text"],
    )


def test_tokenize_query_dedup_and_order():
    assert tokenize_query("  Fox the FOX   dog ") == ["fox", "the", "dog"]


def test_bm25_postings_tf_and_dl(spark):
    p = bm25_postings(_corpus(spark))
    rows = {(r["id"], r["term"]): (r["tf"], r["dl"]) for r in p.collect()}
    assert rows[(1, "the")] == (2, 9)
    assert rows[(5, "fox")] == (3, 3)


def test_bm25_search_matches_reference_formula(spark):
    got = bm25_search(_corpus(spark), "quick fox", top_k=5).collect()
    # independent recomputation in plain python
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the lazy dog sleeps all day long",
        3: "a quick brown rabbit runs past the fox den",
        4: "stock markets fell sharply on quarterly reports",
        5: "fox fox fox",
    }
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    expected = {}
    for i, t in toks.items():
        si = 0
        hits = 0
        for term in ("quick", "fox"):
            tf = t.count(term)
            if tf == 0:
                continue
            hits += 1
            df = sum(1 for tt in toks.values() if term in tt)
            idf6 = math.floor(
                math.log(1 + (n - df + 0.5) / (df + 0.5)) * 1e6 + 0.5
            ) / 1e6
            tfpart = (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(t) / avgdl)
            )
            si += math.floor(idf6 * tfpart * 1e6 + 0.5)
        if hits:
            expected[i] = (hits, si / 1e6)
    assert {r["doc_id"]: (r["n_terms_hit"], r["score"]) for r in got} == expected
    # ordering: score desc, id asc
    scores = [(r["score"], r["doc_id"]) for r in got]
    assert scores == sorted(scores, key=lambda s: (-s[0], s[1]))


def test_bm25_search_top_k_bound(spark):
    assert bm25_search(_corpus(spark), "the fox", top_k=2).count() == 2


def test_rrf_fuse_scores_and_absences(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    got = {
        r["doc_id"]: (r["n_lists"], r["rrf_score"])
        for r in rrf_fuse([a, b], top_k=10).collect()
    }
    q6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    assert got[3] == (2, q6(1 / 63 + 1 / 61))
    assert got[1] == (1, q6(1 / 61))
    assert got[4] == (1, q6(1 / 62))
    # doc 3 appears in both lists -> top fused rank
    top = rrf_fuse([a, b], top_k=1).collect()[0]
    assert top["doc_id"] == 3


def test_bm25_plan_has_no_python_exec(spark):
    plan = bm25_search(_corpus(spark), "quick fox")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_empty_query_raises(spark):
    try:
        bm25_search(_corpus(spark), "   ")
    except ValueError as e:
        assert "no tokens" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_rrf_handles_duplicate_free_full_outer(spark):
    # single list fusion degenerates to 1/(k0+rank) ordering
    a = spark.createDataFrame([(7, 1), (8, 2)], ["doc_id", "rank"])
    got = [r["doc_id"] for r in rrf_fuse([a]).collect()]
    assert got == [7, 8]
