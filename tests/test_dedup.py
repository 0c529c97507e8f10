"""Dedup operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine (training-data pipeline extensions)."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.dedup import (
    drop_exact_duplicates,
    embedding_cosine_pairs,
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),          # near dup of 1
    (4, "completely different content about spark engines here"),
    (5, "pack my box with five dozen liquor jugs"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicate_groups(docs):
    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["keep_id"] == 1


def test_drop_exact_duplicates_keeps_min_id(docs):
    kept = {r["doc_id"] for r in drop_exact_duplicates(docs).collect()}
    assert kept == {1, 3, 4, 5}


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got          # identical -> jaccard 1.0
    assert (1, 3) in got and (2, 3) in got  # one-word diff
    assert all(a < b for a, b in got)
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert by_pair[(1, 2)] == 1.0
    assert 0.5 <= by_pair[(1, 3)] < 1.0


def test_minhash_lsh_agrees_with_exact_jaccard(docs):
    """LSH candidates are verified with exact Jaccard, so at high threshold
    LSH output must be a subset of the exact pairs with equal scores."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, num_perm=16, bands=8, verify_threshold=0.5
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert exact[pair] == j
    assert (1, 2) in lsh  # identical docs always collide in every band


def test_minhash_requires_divisible_bands(docs):
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(docs, num_perm=16, bands=5)


def test_simhash_identical_docs_equal_fingerprints(docs):
    fp = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]
    assert all(isinstance(v, int) for v in fp.values())


def test_simhash_pairs_blocking_finds_identical(docs):
    pairs = simhash_pairs(docs, bits=32, max_hamming=3, chunks=4).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0


def test_simhash_bits_cap(spark):
    with pytest.raises(ValueError, match="60"):
        simhash(spark.createDataFrame([(1, "x")], ["doc_id", "text"]), bits=64)


def test_embedding_cosine_pairs(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.01, 0.0]),   # near-parallel to 1
            (3, [0.0, 1.0, 0.0]),    # orthogonal
        ],
        ["vec_id", "embedding"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(vecs, threshold=0.9).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.99


def test_embedding_cosine_pairs_gates_to_lsh_above_threshold(spark):
    """Above brute_threshold the default plan must block by LSH bucket —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    vecs = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(50)],
        ["vec_id", "embedding"],
    )
    gated = embedding_cosine_pairs(vecs, threshold=0.9, brute_threshold=10)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the small-corpus default stays the exact all-pairs join
    brute = embedding_cosine_pairs(vecs, threshold=0.9, brute_threshold=1000)
    plan_b = brute._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" in plan_b or "BroadcastNestedLoopJoin" in plan_b
    # LSH results are a subset of the exact pairs (blocking loses recall,
    # never adds false positives)
    exact = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in gated.collect()}
    assert lsh <= exact


def test_duplicate_clusters_chain_and_islands(spark):
    from biomedical_data_integration_spark.operators.dedup import duplicate_clusters

    # a 6-node chain (stresses multi-round star convergence), a 2-node
    # island, and a singleton-free pair list
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21), (21, 20)],
        ["id_a", "id_b"],
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10,
        20: 20, 21: 20,
    }


def test_duplicate_clusters_empty(spark):
    from biomedical_data_integration_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert duplicate_clusters(pairs).count() == 0


def test_cross_corpus_contamination(spark):
    from biomedical_data_integration_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # contains eval 100
            (2, "totally unrelated words here nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [
            (100, "beta gamma delta epsilon"),     # fully inside train 1
            (200, "different benchmark content entirely distinct"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["train_id"], r["eval_id"]): r["containment"]
        for r in cross_corpus_contamination(train, ev, min_containment=0.5).collect()
    }
    assert got == {(1, 100): 1.0}


def test_duplicate_clusters_distributed_path_matches_driver_path(spark):
    from biomedical_data_integration_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21), (21, 20)],
        ["id_a", "id_b"],
    )
    want = sorted(
        (r["doc_id"], r["cluster_id"]) for r in duplicate_clusters(pairs).collect()
    )
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(pairs, driver_threshold=0).collect()
    )
    assert got == want and want[0] == (1, 1)


def test_bloom_decontaminate_removes_overlaps_keeps_clean(spark):
    from biomedical_data_integration_spark.operators.dedup import (
        bloom_decontaminate,
    )

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    tr = spark.createDataFrame(
        [
            (1, "he said the quick brown fox appeared"),   # shares a shingle
            (2, "completely unrelated words entirely here"),
            (3, "zz"),                                     # < 3 tokens: no shingles
            (4, None),                                     # null text survives
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"] for r in bloom_decontaminate(tr, ev).collect()}
    assert 1 not in got           # true contamination always removed
    assert {2, 3, 4} <= got       # tiny bloom load -> no false positives here


def test_bloom_decontaminate_is_conservative_superset_of_exact(spark):
    """Bloom removals must be a superset of exact shingle-overlap removals
    (false positives allowed, false negatives never)."""
    from biomedical_data_integration_spark.operators.dedup import (
        bloom_decontaminate,
        shingle_sets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where(F.col("doc_id") % 10 == 0)
    tr = docs.where(F.col("doc_id") % 10 != 0)
    surv = {r["doc_id"] for r in bloom_decontaminate(tr, ev).select("doc_id").collect()}
    ev_sh = shingle_sets(ev, "text", "doc_id").select("shingle").distinct()
    exact_hits = {
        r["id"]
        for r in shingle_sets(tr, "text", "doc_id")
        .join(ev_sh, "shingle").select("id").distinct().collect()
    }
    # nothing with a REAL overlap may survive the bloom gate
    assert not (surv & exact_hits)


def test_keep_best_duplicates_prefers_high_score(spark):
    from biomedical_data_integration_spark.operators.dedup import (
        keep_best_duplicates,
    )

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 50.0), (3, 50.0), (4, 7.0), (9, 99.0)],
        "doc_id bigint, quality double",
    )
    # {1,2,3} one cluster, {4} pairs with nothing, 9 never in pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in keep_best_duplicates(docs, pairs, "quality").collect()}
    # doc 2 wins the cluster (score tie with 3 -> lowest id); singletons kept
    assert out == {2: 1, 4: None, 9: None}


def test_minhash_lsh_join_asymmetric(spark):
    from biomedical_data_integration_spark.operators.dedup import (
        minhash_lsh_join,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely different content about spark engines "
                        "and distributed join strategies for large corpora")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, base + " extra"),           # near-dup of corpus doc 0
         (3, "novel text that matches nothing in the standing corpus at "
             "all whatsoever in any shingle window")],
        "doc_id bigint, text string",
    )
    out = minhash_lsh_join(new, corpus, verify_threshold=0.5).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in out} == {(1, 0)}
    assert all(r["jaccard"] >= 0.5 for r in out)
    # corpus x corpus near-dups must NOT appear (asymmetric contract)
    both = spark.createDataFrame(
        [(0, base), (2, base + " twice")], "doc_id bigint, text string"
    )
    none = minhash_lsh_join(new.where("doc_id = 3"), both)
    assert none.count() == 0


def test_minhash_corpus_entries_parquet_round_trip(spark, tmp_path):
    """The persistence contract (round-7 verdict item 7):
    minhash_corpus_entries written to parquet and reloaded in a NEW
    session must bucket a delta to exactly the candidate set the direct
    two-corpus join computes — the state really is reusable across
    ingests, not an artifact of in-session plan reuse."""
    from biomedical_data_integration_spark.operators.dedup import (
        minhash_corpus_entries,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely different content about spark engines "
                        "and distributed join strategies for large corpora")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, base + " extra"),
         (3, "novel text that matches nothing in the standing corpus at "
             "all whatsoever in any shingle window")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "corpus_band_entries")
    minhash_corpus_entries(corpus).write.mode("overwrite").parquet(path)

    # fresh session: nothing cached, nothing shared but the files
    s2 = spark.newSession()
    persisted = s2.read.parquet(path).withColumnRenamed("id", "corpus_id")
    delta_entries = minhash_corpus_entries(
        s2.createDataFrame(new.collect(), new.schema)
    ).withColumnRenamed("id", "new_id")
    got = {
        (r["new_id"], r["corpus_id"])
        for r in delta_entries.join(persisted, ["band", "key"])
        .select("new_id", "corpus_id")
        .distinct()
        .collect()
    }
    # direct (no persistence) candidate set over the same two corpora
    direct_new = minhash_corpus_entries(new).withColumnRenamed("id", "new_id")
    direct_corp = minhash_corpus_entries(corpus).withColumnRenamed(
        "id", "corpus_id"
    )
    want = {
        (r["new_id"], r["corpus_id"])
        for r in direct_new.join(direct_corp, ["band", "key"])
        .select("new_id", "corpus_id")
        .distinct()
        .collect()
    }
    assert got == want
    assert (1, 0) in got  # the near-dup buckets together


def test_lsh_tuning_report_curve(spark):
    """lsh_tuning_report: exact-Jaccard buckets, candidate flags, and
    the closed-form S-curve line up — identical docs band (recall 1 in
    the top bucket), disjoint-ish docs land low with theory ~0, and
    every n_banded <= n_pairs with recall = the exact ratio."""
    from biomedical_data_integration_spark.operators.dedup import (
        lsh_tuning_report,
    )

    words = [f"w{i}" for i in range(40)]
    rows = [
        (0, " ".join(words)),                      # base
        (2, " ".join(words)),                      # identical -> jac 1.0
        (4, " ".join(words[:20] + [f"x{i}" for i in range(20)])),  # partial
        (6, " ".join(f"z{i}" for i in range(40))),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["bucket"]: r for r in lsh_tuning_report(
        df, sample_mod=1, n_buckets=10).collect()}
    top = out[9]
    assert top["n_pairs"] >= 1 and top["n_banded"] == top["n_pairs"]
    assert top["recall"] == 1.0 and top["theory_p"] > 0.99
    for r in out.values():
        assert 0 <= r["n_banded"] <= r["n_pairs"]
        assert abs(r["recall"] - r["n_banded"] / r["n_pairs"]) < 1e-6
        assert 0.0 <= r["theory_p"] <= 1.0
    # the half-overlap pairs land in a MID bucket with a mid-low
    # S-curve probability (the tuning signal); the disjoint doc shares
    # no shingle, so it is excluded entirely (documented contract)
    mid = [r for b, r in out.items() if b < 9]
    assert mid and all(r["theory_p"] < 0.5 for r in mid)
    assert sum(r["n_pairs"] for r in out.values()) == 3  # (0,2),(0,4),(2,4)
    # sample gate: only ids % mod == 0 participate
    gated = lsh_tuning_report(df, sample_mod=4, n_buckets=10).collect()
    # ids 0 and 4 remain -> exactly one overlapping pair
    assert sum(r["n_pairs"] for r in gated) == 1


def test_lsh_tuning_max_shingle_freq_bounds_hot_key(spark):
    """A boilerplate shingle present in EVERY document is the
    quadratic hot key in the exact-Jaccard self-join (round-8 verdict):
    with max_shingle_freq below the corpus size it must be dropped
    structurally — documents that share ONLY the boilerplate produce
    zero verified pairs, while genuinely overlapping pairs survive."""
    from biomedical_data_integration_spark.operators.dedup import (
        lsh_tuning_report,
    )

    boiler = "all rights reserved"
    rows = [
        (2 * i, f"unique{i}a unique{i}b unique{i}c {boiler}")
        for i in range(12)
    ]
    # one genuine near-dup pair sharing real content
    rows += [
        (100, f"alpha beta gamma delta epsilon {boiler}"),
        (102, f"alpha beta gamma delta zeta {boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    uncapped = lsh_tuning_report(df, sample_mod=1, n_buckets=10)
    capped = lsh_tuning_report(
        df, sample_mod=1, n_buckets=10, max_shingle_freq=4
    )
    # every doc shares the boilerplate shingles -> ~n^2/2 pairs uncapped
    n_unc = sum(r["n_pairs"] for r in uncapped.collect())
    assert n_unc == (14 * 13) // 2
    # capped: only the exact boilerplate 3-gram has df 14 (shingles
    # STRADDLING the boilerplate boundary stay unique per doc), so the
    # sole surviving pair is the genuine one
    cap_rows = capped.collect()
    assert sum(r["n_pairs"] for r in cap_rows) == 1
    (pair_bucket,) = [r for r in cap_rows if r["n_pairs"] == 1]
    # Jaccard over the CAPPED universe: 2 shared ("alpha beta gamma",
    # "beta gamma delta") / 8 union surviving shingles = 0.25
    assert pair_bucket["jaccard_lo"] == 0.2


def test_lsh_tuning_band_entries_reuse_matches_self_computed(spark):
    """Passing the persisted corpus (id, band, key) table
    (minhash_corpus_entries) must reproduce the self-computed report
    bit-for-bit — tuning rides the standing dedup state instead of
    recomputing signatures (round-8 verdict item)."""
    from biomedical_data_integration_spark.operators.dedup import (
        lsh_tuning_report,
        minhash_corpus_entries,
    )

    words = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(words[: 10 + (i * 7) % 20] + [f"u{i}"]))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    entries = minhash_corpus_entries(df, num_perm=16, bands=4)
    self_computed = sorted(
        map(tuple, lsh_tuning_report(df, sample_mod=2).collect())
    )
    reused = sorted(
        map(
            tuple,
            lsh_tuning_report(
                df, sample_mod=2, band_entries=entries
            ).collect(),
        )
    )
    assert self_computed == reused and len(reused) > 0


# ---------------------------------------------------------------------------
# exact-substring span removal (Lee et al. ACL'22, word granularity)
# ---------------------------------------------------------------------------


@pytest.fixture()
def span_docs(spark):
    return spark.createDataFrame(
        [
            # 1 and 2 share the 4-gram "alpha beta gamma delta" inside
            # otherwise-unique text
            (1, "intro one alpha beta gamma delta tail one unique"),
            (2, "Other START Alpha Beta GAMMA delta closing words two"),
            # 3 is entirely made of a span duplicated in 4
            (3, "omega psi chi phi"),
            (4, "omega psi chi phi plus extra trailing content here"),
            # 5 repeats its own 4-gram twice (within-doc repeat)
            (5, "rep one rep two rep one rep two rep one rep two"),
            # 6 is shorter than the shingle width: passes through
            (6, "tiny doc"),
            # 7 shares nothing
            (7, "seven distinct words nothing shared with anything else"),
        ],
        ["doc_id", "text"],
    )


def _span_map(df, **kw):
    from biomedical_data_integration_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    return {
        r["doc_id"]: r for r in remove_duplicate_spans(df, **kw).collect()
    }


def test_remove_duplicate_spans_excises_shared_span(span_docs):
    out = _span_map(span_docs, shingle_words=4)
    # the shared 4-gram vanishes from BOTH docs, case-normalized
    assert out[1]["text_deduped"] == "intro one tail one unique"
    assert out[2]["text_deduped"] == "other start closing words two"
    assert out[1]["n_removed"] == 4 and out[2]["n_removed"] == 4


def test_remove_duplicate_spans_fully_covered_doc_empties(span_docs):
    out = _span_map(span_docs, shingle_words=4)
    assert out[3]["text_deduped"] == ""
    assert out[3]["n_removed"] == out[3]["n_tokens"] == 4
    assert out[3]["removed_ratio"] == 1.0
    # the other copy keeps its unique suffix
    assert out[4]["text_deduped"] == "plus extra trailing content here"


def test_remove_duplicate_spans_within_doc_repeats_count(span_docs):
    out = _span_map(span_docs, shingle_words=4)
    # "rep one rep two" repeats inside doc 5 alone -> fully covered
    assert out[5]["text_deduped"] == ""
    assert out[5]["removed_ratio"] == 1.0


def test_remove_duplicate_spans_untouched_docs_normalized(span_docs):
    out = _span_map(span_docs, shingle_words=4)
    # short doc: no positional shingles, passes through token-normalized
    assert out[6]["text_deduped"] == "tiny doc"
    assert out[6]["n_removed"] == 0
    assert out[7]["n_removed"] == 0
    assert (
        out[7]["text_deduped"]
        == "seven distinct words nothing shared with anything else"
    )
    # one row per input document, no drops
    assert len(out) == 7


def test_remove_duplicate_spans_min_count(span_docs):
    # min_count=3: the pairwise-shared spans (2 occurrences) survive...
    out = _span_map(span_docs, shingle_words=4, min_count=3)
    assert all(
        r["n_removed"] == 0 for d, r in out.items() if d != 5
    )
    # ...but doc 5's "rep one rep two" occurs at positions 1, 5, 9 ->
    # count 3 -> still removed (fully covering the doc)
    assert out[5]["text_deduped"] == ""
    assert out[5]["n_removed"] == out[5]["n_tokens"]


def _char_span_map(spark, rows, **kw):
    from biomedical_data_integration_spark.operators.dedup import (
        remove_duplicate_spans_chars,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in remove_duplicate_spans_chars(df, **kw).collect()
    }


def test_remove_duplicate_spans_chars_excises_and_passes_verbatim(spark):
    rows = [
        (1, "AAAABBBBCCCCDDDD unique tail one"),
        (2, "AAAABBBBCCCCDDDD unique tail two"),
        (3, "Totally  Different,  with CASE and  spacing kept!"),
        (4, "short"),
        (5, ""),
    ]
    out = _char_span_map(spark, rows, gram_chars=16)
    # shared 29-char prefix fully covered by duplicated 16-grams
    assert out[1]["text_deduped"] == "one"
    assert out[2]["text_deduped"] == "two"
    assert out[1]["n_removed"] == 29 and out[1]["n_chars"] == 32
    # untouched docs pass through VERBATIM — char mode never rewrites
    # case or whitespace (unlike the token-normalizing word form)
    assert out[3]["text_deduped"] == rows[2][1]
    # below gram width / empty: no positional grams, untouched
    assert out[4]["text_deduped"] == "short" and out[4]["n_removed"] == 0
    assert out[5]["text_deduped"] == "" and out[5]["removed_ratio"] == 0.0
    assert len(out) == 5


def test_remove_duplicate_spans_chars_within_doc_and_merge(spark):
    # within-doc repeat: both occurrences (and the chars between, covered
    # by grams spanning the boundary) excise; merged intervals stitch
    rows = [(1, "xx AAAABBBBCCCCDDDD yy AAAABBBBCCCCDDDD zz")]
    out = _char_span_map(spark, rows, gram_chars=16)
    assert out[1]["text_deduped"] == "xxyyzz"
    assert out[1]["n_removed"] == out[1]["n_chars"] - 6
    # fully self-duplicated doc empties
    rows2 = [(1, "ababababababababababababababab")]
    out2 = _char_span_map(spark, rows2, gram_chars=8)
    assert out2[1]["text_deduped"] == ""
    assert out2[1]["removed_ratio"] == 1.0


def test_remove_duplicate_spans_chars_min_count_and_validation(spark):
    rows = [
        (1, "AAAABBBBCCCCDDDD unique tail one"),
        (2, "AAAABBBBCCCCDDDD unique tail two"),
    ]
    out = _char_span_map(spark, rows, gram_chars=16, min_count=3)
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0
    assert out[1]["text_deduped"] == rows[0][1]
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.dedup import (
        remove_duplicate_spans_chars,
    )

    with _pytest.raises(ValueError, match="gram_chars"):
        remove_duplicate_spans_chars(
            _char_span_fixture_df(spark), gram_chars=1
        )


def _char_span_fixture_df(spark):
    return spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
