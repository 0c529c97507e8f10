"""BM25 full-text search and reciprocal-rank-fusion hybrid retrieval."""

import math

import pytest

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


def test_ranking_metrics_golden(spark):
    import math

    from biomedical_data_integration_spark.operators.retrieval import (
        ranking_metrics,
    )

    ranked = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (2, "x", 1), (2, "y", 2)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, "b", 1), (1, "c", 2), (1, "z", 3), (2, "q", 1)],
        ["query_id", "doc_id", "relevance"],
    )
    got = {
        r["query_id"]: r
        for r in ranking_metrics(ranked, qrels, k=3).collect()
    }
    q1 = got[1]
    assert q1["n_hits"] == 2
    assert q1["precision_at_3"] == pytest.approx(2 / 3, abs=1e-6)
    assert q1["mrr"] == pytest.approx(1 / 2, abs=1e-6)
    # dcg = 1/log2(3) + 2/log2(4); idcg = 3/log2(2) + 2/log2(3) + 1/log2(4)
    g = lambda rel, pos: math.floor(rel / math.log2(pos + 1) * 1e6 + 0.5)  # noqa: E731
    dcg = g(1, 2) + g(2, 3)
    idcg = g(3, 1) + g(2, 2) + g(1, 3)
    assert q1["ndcg_at_3"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)
    # query 2 retrieved nothing relevant
    q2 = got[2]
    assert q2["n_hits"] == 0 and q2["mrr"] == 0.0 and q2["ndcg_at_3"] == 0.0


def test_ranking_metrics_perfect_ranking_is_1(spark):
    from biomedical_data_integration_spark.operators.retrieval import (
        ranking_metrics,
    )

    ranked = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], ["query_id", "doc_id", "rank"]
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1)], ["query_id", "doc_id", "relevance"]
    )
    r = ranking_metrics(ranked, qrels, k=2).collect()[0]
    assert r["ndcg_at_2"] == pytest.approx(1.0, abs=1e-6)
    assert r["mrr"] == 1.0


def test_ranking_metrics_validates(spark):
    from biomedical_data_integration_spark.operators.retrieval import (
        ranking_metrics,
    )

    df = spark.createDataFrame([(1, "a", 1)], ["query_id", "doc_id", "rank"])
    with pytest.raises(ValueError):
        ranking_metrics(df, df, k=0)


def test_bm25_persisted_serves_identically_and_prunes(spark):
    """save -> probe must return exactly bm25_search's rows for the same
    corpus and query (shared _bm25_rank arithmetic, literal sidecar
    stats), with the postings read bucket-pruned and corpus-free."""
    import os
    import tempfile

    from biomedical_data_integration_spark.operators.retrieval import (
        _bm25_term_bucket,
        bm25_save_index,
        bm25_search,
        bm25_search_persisted,
        tokenize_query,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = "spark window join customer"
    want = [tuple(r) for r in bm25_search(docs, q, top_k=15).collect()]
    path = os.path.join(tempfile.mkdtemp(), "bm25")
    bm25_save_index(docs, path, n_buckets=8)
    served = bm25_search_persisted(spark, path, q, top_k=15)
    got = [tuple(r) for r in served.collect()]
    assert got == want
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert not plan.split("PartitionFilters: [", 1)[1].startswith("]")
    assert "documents.parquet" not in plan
    # the python bucket twin matches the engine's md5_bigint bucketing:
    # every probed term's postings were present (scores identical above),
    # and a term outside the probed buckets yields no hits
    probed = {_bm25_term_bucket(t, 8) for t in tokenize_query(q)}
    assert probed <= set(range(8))


def test_bm25_save_index_validation(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_save_index,
        bm25_search_persisted,
    )

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="n_buckets"):
        bm25_save_index(docs, "/tmp/x", n_buckets=0)
    with _pytest.raises(ValueError, match="no tokens"):
        bm25_search_persisted(spark, "/tmp/x", "   ")


def test_bm25_persisted_many_matches_per_query_probes(spark):
    """The batch face must return, per query, EXACTLY the single-probe
    face's rows (same index, same top_k) — one pruned scan replacing
    one job per query, never different arithmetic. Shared terms across
    queries must not inflate df (the window-count derivation)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_save_index,
        bm25_search_persisted,
        bm25_search_persisted_many,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = os.path.join(tempfile.mkdtemp(), "bm25m")
    bm25_save_index(docs, path, n_buckets=8)
    queries = [
        (1, "spark window join customer"),
        (2, "hash value scan order"),
        (3, "spark window"),  # shares terms with query 1
    ]
    qdf = spark.createDataFrame(queries, "query_id int, query string")
    many = bm25_search_persisted_many(spark, path, qdf, top_k=12)
    got = {
        qid: [
            (r["doc_id"], r["n_terms_hit"], r["score"])
            for r in many.where(F.col("query_id") == qid)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        ]
        for qid, _ in queries
    }
    for qid, q in queries:
        want = [
            (r["doc_id"], r["n_terms_hit"], r["score"])
            for r in bm25_search_persisted(
                spark, path, q, top_k=12
            ).collect()
        ]
        assert got[qid] == want, f"query {qid} diverges from single probe"


def test_bm25_persisted_many_validation(spark):
    import os
    import tempfile

    import pytest as _pytest

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_save_index,
        bm25_search_persisted_many,
    )

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    path = os.path.join(tempfile.mkdtemp(), "bm25v")
    bm25_save_index(docs, path, n_buckets=2)
    empty = spark.createDataFrame(
        [(1, "   ")], "query_id int, query string"
    )
    with _pytest.raises(ValueError, match="no query has any tokens"):
        bm25_search_persisted_many(spark, path, empty)


def test_bm25_save_index_stats_exclude_empty_docs(spark):
    """(n_docs, avgdl) must match the postings-derived doclens exactly:
    a document with no tokens contributes no postings and must not
    count (the stats-before-write refactor keeps this contract)."""
    import os
    import tempfile

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_save_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "a")], ["doc_id", "text"]
    )
    path = os.path.join(tempfile.mkdtemp(), "bm25s")
    bm25_save_index(docs, path, n_buckets=2)
    srow = spark.read.parquet(f"{path}/stats").first()
    assert srow["n_docs"] == 2
    assert srow["avgdl"] == 2.0  # (3 + 1) / 2


def test_bm25_append_index_serves_identically_to_full_build(spark):
    """build(A) + append(B) must serve EXACTLY like build(A ∪ B): same
    postings set, stats recombined from exact bigint token totals."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_append_index,
        bm25_save_index,
        bm25_search_persisted,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    base = tempfile.mkdtemp()
    full, incr = os.path.join(base, "full"), os.path.join(base, "incr")
    bm25_save_index(docs, full, n_buckets=8)
    bm25_save_index(a, incr, n_buckets=8)
    bm25_append_index(b, incr)
    sf = spark.read.parquet(f"{full}/stats").first()
    si = spark.read.parquet(f"{incr}/stats").first()
    assert (si["n_docs"], si["sum_dl"], si["avgdl"]) == (
        sf["n_docs"], sf["sum_dl"], sf["avgdl"],
    )
    q = "spark window join customer"
    want = [tuple(r) for r in
            bm25_search_persisted(spark, full, q, top_k=25).collect()]
    got = [tuple(r) for r in
           bm25_search_persisted(spark, incr, q, top_k=25).collect()]
    assert got == want


def test_bm25_append_index_validation(spark):
    import os
    import tempfile

    import pytest as _pytest

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_append_index,
    )

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    missing = os.path.join(tempfile.mkdtemp(), "nope")
    with _pytest.raises(Exception):
        bm25_append_index(docs, missing)


def test_bm25_append_index_crash_safety_marker(spark):
    """ADVICE r11 (medium): a crashed append leaves _APPEND_PENDING on
    disk; the next append must refuse (postings may hold a partial
    batch the stats sidecar does not account for) until a rebuild, and
    a COMPLETED append must leave no marker and no stats.new/.old
    residue — the stats swap is rename-based, never an in-place
    overwrite of the served path."""
    import os
    import tempfile

    import pytest as _pytest

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_append_index,
        bm25_save_index,
    )
    from biomedical_data_integration_spark.sources.writers import (
        touch_marker,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], ["doc_id", "text"]
    )
    path = os.path.join(tempfile.mkdtemp(), "idx")
    bm25_save_index(docs, path, n_buckets=4)
    more = spark.createDataFrame([(3, "gamma delta")], ["doc_id", "text"])
    bm25_append_index(more, path)
    # completed append: marker cleared, no swap residue, stats sane
    assert not os.path.exists(os.path.join(path, "_APPEND_PENDING"))
    assert not os.path.exists(os.path.join(path, "stats.new"))
    assert not os.path.exists(os.path.join(path, "stats.old"))
    srow = spark.read.parquet(f"{path}/stats").first()
    assert srow["n_docs"] == 3 and srow["sum_dl"] == 6
    # simulate a crash mid-append: marker present -> append refuses
    touch_marker(spark, f"{path}/_APPEND_PENDING")
    with _pytest.raises(ValueError, match="did not complete"):
        bm25_append_index(more, path)


def test_bm25_compact_index_serves_bit_identically(spark):
    """Two appends leave >1 part file in the appended buckets; compact
    must rewrite fragmented buckets to ONE file each with probe results
    hash-equal before/after and the stats sidecar untouched."""
    import glob
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_append_index,
        bm25_compact_index,
        bm25_save_index,
        bm25_search_persisted,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    path = os.path.join(tempfile.mkdtemp(), "idx")
    bm25_save_index(docs.where(F.col("doc_id") % 3 == 0), path, n_buckets=8)
    bm25_append_index(docs.where(F.col("doc_id") % 3 == 1), path)
    bm25_append_index(docs.where(F.col("doc_id") % 3 == 2), path)

    def files_per_bucket():
        return {
            b: len(glob.glob(os.path.join(b, "*.parquet")))
            for b in glob.glob(os.path.join(path, "postings", "bucket=*"))
        }

    assert any(n > 1 for n in files_per_bucket().values())
    q = "spark window join customer"
    before = [tuple(r) for r in
              bm25_search_persisted(spark, path, q, top_k=25).collect()]
    stats_before = spark.read.parquet(f"{path}/stats").first()
    compacted = bm25_compact_index(spark, path)
    assert compacted  # something was fragmented
    after_counts = files_per_bucket()
    assert all(n == 1 for n in after_counts.values())
    after = [tuple(r) for r in
             bm25_search_persisted(spark, path, q, top_k=25).collect()]
    assert after == before
    assert spark.read.parquet(f"{path}/stats").first() == stats_before
    # idempotent: nothing fragmented anymore
    assert bm25_compact_index(spark, path) == []


def test_bm25_delete_ids_equals_rebuild_without_deleted(spark):
    """delete-then-probe must serve bit-identically to an index built
    from the corpus minus the deleted docs — stats decremented from
    exact bigints, only affected buckets rewritten."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_delete_ids,
        bm25_save_index,
        bm25_search_persisted,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    base = tempfile.mkdtemp()
    full, truth = os.path.join(base, "full"), os.path.join(base, "truth")
    bm25_save_index(docs, full, n_buckets=8)
    deleted = [r[0] for r in
               docs.where(F.col("doc_id") % 7 == 3).select("doc_id").collect()]
    res = bm25_delete_ids(spark, full, deleted)
    assert res["n_docs_removed"] == len(deleted)
    bm25_save_index(
        docs.where(F.col("doc_id") % 7 != 3), truth, n_buckets=8
    )
    sf, st = (spark.read.parquet(f"{p}/stats").first() for p in (full, truth))
    assert (sf["n_docs"], sf["sum_dl"], sf["avgdl"]) == (
        st["n_docs"], st["sum_dl"], st["avgdl"],
    )
    q = "spark window join customer"
    got = [tuple(r) for r in
           bm25_search_persisted(spark, full, q, top_k=25).collect()]
    want = [tuple(r) for r in
            bm25_search_persisted(spark, truth, q, top_k=25).collect()]
    assert got == want
    # no marker residue; absent-id delete is a no-op
    assert not os.path.exists(os.path.join(full, "_MAINT_PENDING"))
    assert bm25_delete_ids(spark, full, [10**9])["n_docs_removed"] == 0


def test_bm25_upsert_equals_rebuild_with_replacement(spark):
    """Upsert = delete + frozen-hash append: serve must equal a rebuild
    where the batch's documents replaced their old versions."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_save_index,
        bm25_search_persisted,
        bm25_upsert_docs,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    base = tempfile.mkdtemp()
    live, truth = os.path.join(base, "live"), os.path.join(base, "truth")
    bm25_save_index(docs, live, n_buckets=8)
    batch = docs.where(F.col("doc_id") % 9 == 4).select(
        "doc_id", F.concat(F.col("text"), F.lit(" upserted")).alias("text")
    )
    res = bm25_upsert_docs(batch, live)
    assert res["n_docs_removed"] == batch.count()
    replaced = docs.where(F.col("doc_id") % 9 != 4).unionByName(batch)
    bm25_save_index(replaced, truth, n_buckets=8)
    sf, st = (spark.read.parquet(f"{p}/stats").first() for p in (live, truth))
    assert (sf["n_docs"], sf["sum_dl"], sf["avgdl"]) == (
        st["n_docs"], st["sum_dl"], st["avgdl"],
    )
    for q in ("spark window join customer", "upserted"):
        got = [tuple(r) for r in
               bm25_search_persisted(spark, live, q, top_k=25).collect()]
        want = [tuple(r) for r in
                bm25_search_persisted(spark, truth, q, top_k=25).collect()]
        assert got == want
