"""Text-analysis operators: language ID, quality, token counts,
fingerprints."""

from biomedical_data_integration_spark.operators.text import (
    detect_language,
    document_fingerprints,
    quality_features,
    token_counts,
)


def test_detect_language(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "el gato es de la casa y es feliz por que si"),
            (3, "der Hund ist nicht mit der Katze und von zu Hause"),
            (4, "le chat est dans la maison et il est une merveille"),
            (5, "xyzzy plugh qwerty"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["detected_lang"] for r in detect_language(docs).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_quality_features_ranges(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and that is it"),
            (2, "1234567890 !!! ???"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in quality_features(docs).collect()}
    good, junk, empty = rows[1], rows[2], rows[3]
    assert good["quality_score"] > junk["quality_score"]
    for r in rows.values():
        for c in ("alpha_ratio", "digit_ratio", "punct_ratio",
                  "stopword_ratio", "distinct_token_ratio", "quality_score"):
            assert 0.0 <= r[c] <= 1.0
    assert empty["n_tokens"] == 0
    assert junk["digit_ratio"] > 0.4


def test_token_counts(spark):
    docs = spark.createDataFrame([(1, "alpha beta gamma-delta")], ["doc_id", "text"])
    r = token_counts(docs).first()
    assert r["ws_tokens"] == 3
    # ceil(5/4) + ceil(4/4) + ceil(11/4) = 2 + 1 + 3
    assert r["bpe_tokens_est"] == 6


def test_document_fingerprints_deterministic(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),
            (2, "one two three four five six seven"),
            (3, "totally different words appear in this document"),
        ],
        ["doc_id", "text"],
    )
    fp = {r["id"]: r["fingerprint"] for r in document_fingerprints(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    assert len(fp[1]) == 32  # md5 hex


def test_corpus_vocabulary_counts_and_topk(spark):
    from biomedical_data_integration_spark.operators.text import corpus_vocabulary

    docs = spark.createDataFrame(
        [
            (1, "the cat and the hat"),
            (2, "the cat sat"),
            (3, "dog"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["term"]: (r["tf"], r["df"]) for r in corpus_vocabulary(docs).collect()}
    assert rows["the"] == (3, 2)
    assert rows["cat"] == (2, 2)
    assert rows["dog"] == (1, 1)
    top2 = corpus_vocabulary(docs, top_k=2).collect()
    assert [r["term"] for r in top2] == ["the", "cat"]
    # min_doc_freq filters hapax terms
    assert all(
        r["df"] >= 2
        for r in corpus_vocabulary(docs, min_doc_freq=2).collect()
    )


def test_redact_pii_masks_all_kinds(spark):
    from biomedical_data_integration_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.co.uk or call 555-123-4567"),
            (2, "server 192.168.1.100 leaked ssn 123-45-6789"),
            (3, "clean text stays clean"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["redacted_text"] for r in redact_pii(df).collect()}
    assert got[1] == "mail me at [EMAIL] or call [PHONE]"
    assert got[2] == "server [IPV4] leaked ssn [SSN]"
    assert got[3] == "clean text stays clean"


def test_repetition_features(spark):
    from biomedical_data_integration_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "spam line\nspam line\nspam line\nreal line"),
            (2, "buy buy buy buy now"),
            (3, "all distinct tokens here"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: (r["n_lines"], r["dup_line_ratio"], r["top_token_ratio"])
        for r in repetition_features(df).collect()
    }
    assert got[1][0] == 4 and got[1][1] == 0.5        # 2 distinct of 4 lines
    assert got[2][2] == 0.8                            # 'buy' 4 of 5 tokens
    assert got[3][1] == 0.0 and got[3][2] == 0.25
    assert got[4] == (0, 0.0, 0.0)                     # empty doc


def test_chunk_documents_windows_and_overlap(spark):
    from biomedical_data_integration_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "   "), (4, None)],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_tokens=3, overlap=1)
    rows = {(r["id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
            for r in out.collect()}
    # doc 1: 7 tokens, step 2 -> starts 0,2,4 (start 6 would emit "g",
    # a pure suffix of the previous chunk's overlap — suppressed)
    assert rows[(1, 0)] == ("a b c", 3)
    assert rows[(1, 1)] == ("c d e", 3)
    assert rows[(1, 2)] == ("e f g", 3)
    assert (1, 3) not in rows
    assert rows[(2, 0)] == ("x y", 2)
    # empty/null docs produce no chunks
    assert {i for i, _ in rows} == {1, 2}


def test_chunk_and_pack_accept_custom_tokenizer(spark):
    """tokens_fn seam: a custom Column->array<string> tokenizer (stand-in
    for a real BPE encoder) drives both windowing and packing budgets."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        chunk_documents,
        pack_sequences,
    )

    # comma tokenizer — deliberately different from whitespace
    def comma_tokens(col):
        return F.filter(F.split(col, ","), lambda t: F.length(t) > 0)

    docs = spark.createDataFrame([(1, "a,b,c,d,e")], ["doc_id", "text"])
    out = chunk_documents(docs, chunk_tokens=2, overlap=0,
                          tokens_fn=comma_tokens).collect()
    got = sorted((r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in out)
    assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e", 1)]

    packed = pack_sequences(docs, budget_tokens=4, buckets=1,
                            tokens_fn=comma_tokens).collect()
    assert packed[0]["n_tokens"] == 5  # 5 comma tokens, not 1 ws token


def test_chunk_documents_validates_overlap(spark):
    import pytest
    from biomedical_data_integration_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_pack_sequences_prefix_sum_semantics(spark):
    from biomedical_data_integration_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (5 + i % 3))) for i in range(40)],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, budget_tokens=16, buckets=4).collect()
    assert len(out) == 40
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(b for b in by_bucket) <= {0, 1, 2, 3}
    for b, rows in by_bucket.items():
        # within a bucket, bins fill by exclusive prefix sum
        rows = sorted(rows, key=lambda r: (r["bin"], r["bin_offset"]))
        excl = 0
        for r in sorted(rows, key=lambda r: r["bin"] * 16 + r["bin_offset"]):
            assert r["bin"] == excl // 16
            assert r["bin_offset"] == excl % 16
            excl += r["n_tokens"]
    # deterministic under repartitioning
    again = pack_sequences(docs.repartition(7), budget_tokens=16, buckets=4).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_pack_sequences_validates_buckets(spark):
    import pytest
    from biomedical_data_integration_spark.operators.text import pack_sequences

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="power of two"):
        pack_sequences(docs, buckets=48)


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    from biomedical_data_integration_spark.operators.text import unigram_surprisal

    docs = spark.createDataFrame(
        [(1, "common common common common"),
         (2, "common rareword"),
         (3, "common common")],
        ["doc_id", "text"],
    )
    rows = {r["id"]: r for r in unigram_surprisal(docs).collect()}
    assert rows[1]["n_tokens"] == 4
    # doc 2 contains the corpus-unique token -> highest mean surprisal
    assert rows[2]["mean_surprisal"] > rows[1]["mean_surprisal"]
    assert rows[2]["mean_surprisal"] > rows[3]["mean_surprisal"]
    # all-common docs share the same score
    assert rows[1]["mean_surprisal"] == rows[3]["mean_surprisal"]


# ---------------------------------------------------------------------------
# property-based invariants for chunking / packing
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_doc = st.text(
    alphabet="ab c", min_size=0, max_size=40
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=8),
       chunk=st.integers(min_value=2, max_value=6))
def test_chunk_documents_reassembles_tokens(spark, docs, chunk):
    """With overlap=0, concatenating a doc's chunk tokens in chunk_idx
    order reproduces its token stream exactly; chunk sizes are full except
    possibly the last."""
    from biomedical_data_integration_spark.operators.text import chunk_documents

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=chunk, overlap=0).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["id"], []).append(r)
    for i, text in enumerate(docs):
        toks = [t for t in text.lower().strip().split() if t]
        if not toks:
            assert i not in per_doc
            continue
        rows = sorted(per_doc[i], key=lambda r: r["chunk_idx"])
        rebuilt = [t for r in rows for t in r["chunk_text"].split(" ") if t]
        assert rebuilt == toks
        assert all(r["n_tokens"] == chunk for r in rows[:-1])
        assert rows[-1]["n_tokens"] == len(toks) - chunk * (len(rows) - 1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sizes=st.lists(st.integers(min_value=1, max_value=9),
                      min_size=1, max_size=30),
       budget=st.integers(min_value=4, max_value=20))
def test_pack_sequences_bins_are_dense(spark, sizes, budget):
    """Within every bucket: offsets are the exclusive prefix sums (no gaps,
    no overlaps) and every bin except the stream tail starts at offset
    ts where floor semantics hold."""
    from biomedical_data_integration_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate(sizes)],
        ["doc_id", "text"],
    )
    rows = pack_sequences(docs, budget_tokens=budget, buckets=2).collect()
    assert len(rows) == len(sizes)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rs in by_bucket.values():
        rs = sorted(rs, key=lambda r: (r["bin"], r["bin_offset"]))
        excl = 0
        for r in rs:
            assert r["bin"] == excl // budget
            assert r["bin_offset"] == excl % budget
            excl += r["n_tokens"]


def test_dedup_lines_keeps_first_occurrence(spark):
    from biomedical_data_integration_spark.operators.text import dedup_lines

    docs = spark.createDataFrame(
        [(1, "alpha\nbeta\nalpha\ngamma\nbeta"), (2, "solo"), (3, "")],
        ["doc_id", "text"],
    )
    rows = {r["id"]: r for r in dedup_lines(docs).collect()}
    assert rows[1]["text"] == "alpha\nbeta\ngamma"
    assert (rows[1]["n_lines"], rows[1]["n_unique_lines"]) == (5, 3)
    assert rows[2]["text"] == "solo" and rows[2]["n_unique_lines"] == 1
    assert rows[3]["n_lines"] == 1  # empty text is one empty line


def test_encode_token_ids_ranks_and_oov(spark):
    from biomedical_data_integration_spark.operators.text import encode_token_ids

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a z b"), (3, "")],
        ["doc_id", "text"],
    )
    # counts: b=4, a=3, c=1, z=1 -> vocab_size=3 keeps b(0) a(1) c(2); z OOV
    rows = {r["id"]: r for r in encode_token_ids(docs, vocab_size=3).collect()}
    assert rows[1]["token_ids"] == [0, 0, 0, 1, 1, 2]
    assert rows[2]["token_ids"] == [1, -1, 0]
    assert rows[3]["token_ids"] == [] and rows[3]["n_tokens"] == 0


def test_classifier_score_weight_injection(spark):
    import math

    from biomedical_data_integration_spark.operators.text import (
        classifier_score,
        quality_features,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the dog")], ["doc_id", "text"]
    )
    feats = quality_features(docs).collect()[0]
    out = classifier_score(
        docs, weights={"alpha_ratio": 1.5}, bias=-0.25
    ).collect()[0]
    want = 1.0 / (1.0 + math.exp(-(-0.25 + 1.5 * feats["alpha_ratio"])))
    assert abs(out["clf_score"] - round(want, 6)) < 1e-9

    import pytest

    with pytest.raises(ValueError, match="Unknown feature"):
        classifier_score(docs, weights={"not_a_feature": 1.0})


def test_extract_keywords_tfidf(spark):
    from biomedical_data_integration_spark.operators.text import extract_keywords

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id bigint, text string",
    )
    out = extract_keywords(df, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # 'apple' df=1 -> idf=log10(3); appears twice in doc1 -> top keyword
    assert sorted(by_doc[1])[0] == (1, "apple")
    # 'durian' df=1 beats 'cherry' (df=2) despite tf 1 vs 3:
    # 3*log10(1.5)=0.528 < 1*log10(3)=0.477? no: 0.528 > 0.477 -> cherry first
    assert sorted(by_doc[3])[0] == (1, "cherry")
    assert sorted(by_doc[3])[1] == (2, "durian")
    # ranks never exceed top_k
    assert all(r["rank"] <= 2 for r in out)


def test_ngram_stats_bigrams(spark):
    from biomedical_data_integration_spark.operators.text import ngram_stats

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b"), (3, "x")],
        "doc_id bigint, text string",
    )
    out = {r["ngram"]: r["occurrences"] for r in ngram_stats(df, n=2).collect()}
    # doc 3 is shorter than the n-gram width and contributes nothing
    assert out == {"a b": 3, "b c": 1, "c a": 1}


def test_ngram_stats_unigram_matches_token_count(spark):
    from biomedical_data_integration_spark.operators.text import ngram_stats

    df = spark.createDataFrame([(1, "a a b")], "doc_id bigint, text string")
    out = {r["ngram"]: r["occurrences"] for r in ngram_stats(df, n=1).collect()}
    assert out == {"a": 2, "b": 1}


def test_curriculum_buckets_exact_tiers(spark):
    from biomedical_data_integration_spark.operators.text import (
        curriculum_buckets,
    )

    rows = [
        (1, "the and is of to in that it for with clean prose here"),
        (2, "1 2 3 4 5 6 7 8 9 !!!! ????"),
        (3, "the quick brown fox jumps with the lazy dog and it runs"),
        (4, "@@@@ #### 000 111 222"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["bucket"] for r in curriculum_buckets(df, 2).collect()}
    # stopword-rich prose lands in the top tier, junk in the bottom
    assert out[1] == 1 and out[3] == 1
    assert out[2] == 2 and out[4] == 2


def test_curriculum_buckets_approx_path_no_global_sort(spark):
    from biomedical_data_integration_spark.operators.text import (
        curriculum_buckets,
    )

    rows = [(i, f"word {'the ' * (i % 11)}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = curriculum_buckets(df, 4, exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()  # no global sort
    buckets = {r["bucket"] for r in out.collect()}
    assert buckets <= {1, 2, 3, 4} and len(buckets) >= 2


def test_normalize_text_cleanup(spark):
    from biomedical_data_integration_spark.operators.text import normalize_text

    rows = [
        (1, "  Hello\t\tWorld \r\nsecond  LINE\x07 here  "),
        (2, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["text_normalized"]
           for r in normalize_text(df, lowercase=True).collect()}
    assert out[1] == "hello world\nsecond line here"
    assert out[2] == "already clean"
    # input column untouched; opt-outs respected
    raw = normalize_text(df, collapse_whitespace=False, strip_controls=False)
    got = {r["doc_id"]: (r["text"], r["text_normalized"]) for r in raw.collect()}
    assert got[1][0] == rows[0][1] and got[1][1] == rows[0][1]


def test_readability_golden(spark):
    from biomedical_data_integration_spark.operators.text import readability

    # "The cat sat. It ran!" -> words 5, sentences 2, syllables 5
    df = spark.createDataFrame(
        [("d1", "The cat sat. It ran!"), ("d2", ""), ("d3", "Strength")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in readability(df).collect()}
    r = out["d1"]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    flesch = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    fk = 0.39 * (5 / 2) + 11.8 * (5 / 5) - 15.59
    assert abs(r["flesch"] - flesch) < 1e-5
    assert abs(r["fk_grade"] - fk) < 1e-5
    # empty text: zero words -> NULL scores, sentences floor at 1
    r = out["d2"]
    assert r["n_words"] == 0 and r["n_sentences"] == 1
    assert r["flesch"] is None and r["fk_grade"] is None
    # single word, one vowel group ("e"): 1 word / 1 sentence / 1 syllable
    r = out["d3"]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (1, 1, 1)


def test_readability_vowel_groups_do_not_cross_words(spark):
    from biomedical_data_integration_spark.operators.text import readability

    # "idea aeon" -> whole-text tally equals the per-word sum (2 + 1;
    # "aeo" is one group), and never merges across the space
    df = spark.createDataFrame(
        [("d", "idea aeon")], "doc_id string, text string"
    )
    r = readability(df).collect()[0]
    assert r["n_syllables"] == 3 and r["n_words"] == 2


def test_zipf_alpha_golden_and_degenerate(spark):
    import math

    from biomedical_data_integration_spark.operators.text import zipf_alpha

    # counts 8/4/2/1 for a,b,c,d -> exact hill estimate over k=4
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    r = zipf_alpha(df, top_k=4).collect()[0]
    assert (r["k"], r["c_max"], r["c_min"]) == (4, 8, 1)
    denom = sum(math.log(c) for c in (8, 4, 2, 1))
    assert abs(r["alpha"] - (1 + 4 / denom)) < 1e-5
    # all-equal counts -> NULL alpha
    df2 = spark.createDataFrame([(0, "x y z")], "doc_id bigint, text string")
    r2 = zipf_alpha(df2, top_k=3).collect()[0]
    assert r2["alpha"] is None and r2["c_max"] == r2["c_min"] == 1


def test_lexical_diversity_golden(spark):
    from biomedical_data_integration_spark.operators.text import (
        lexical_diversity,
    )

    import math

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "x"), (3, "")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_types"]) == (4, 3)
    assert abs(r1["ttr"] - 0.75) < 1e-6
    assert abs(r1["root_ttr"] - 3 / math.sqrt(4)) < 1e-6
    assert abs(r1["herdan_c"] - math.log(3) / math.log(4)) < 1e-6
    # single token: herdan undefined (ln 1 = 0 denominator)
    assert out[2]["ttr"] == 1.0 and out[2]["herdan_c"] is None
    # empty doc: all ratios NULL
    assert out[3]["n_tokens"] == 0 and out[3]["ttr"] is None


def test_chao1_richness_golden(spark):
    from biomedical_data_integration_spark.operators.text import (
        chao1_richness,
    )

    # counts: a->3, b->2, c->1, d->1  => V=4, f1=2, f2=1
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c d")], "doc_id int, text string"
    )
    r = chao1_richness(df).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (7, 4, 2, 1)
    # chao1 = 4 + 2*1/(2*2) = 4.5 ; coverage = 1 - 2/7
    assert abs(r["chao1"] - 4.5) < 1e-6
    assert abs(r["coverage"] - (1 - 2 / 7)) < 1e-6


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------


def _gopher_map(spark, rows, **kw):
    from biomedical_data_integration_spark.operators.text import gopher_rules

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in gopher_rules(df, **kw).collect()}


GOOD_TEXT = (
    "the data pipeline reads parquet files and writes clean shards that "
    "downstream training jobs consume with care because every document "
    "must have sensible words of normal length and enough common english "
    "glue words to look like prose rather than markup or code for the "
    "filters to be happy about keeping it in the corpus today"
)


def test_gopher_good_document_passes(spark):
    out = _gopher_map(spark, [(1, GOOD_TEXT)])
    r = out[1]
    assert r["passes_gopher"]
    assert r["flag_word_count"] and r["flag_stop_words"]
    assert r["n_stop_words"] >= 2


def test_gopher_word_count_gate(spark):
    out = _gopher_map(spark, [(1, "too short to pass"), (2, GOOD_TEXT)])
    assert not out[1]["flag_word_count"]
    assert not out[1]["passes_gopher"]
    assert out[2]["flag_word_count"]
    # a tighter min_words knob flips the good doc too
    out = _gopher_map(spark, [(2, GOOD_TEXT)], min_words=1000)
    assert not out[2]["flag_word_count"]


def test_gopher_symbol_ratio_gate(spark):
    hashy = " ".join(["word#tag"] * 30 + ["plain"] * 30)
    out = _gopher_map(spark, [(1, hashy)], min_words=10)
    assert out[1]["n_hash_symbols"] == 30
    assert not out[1]["flag_symbol_ratio"]
    # the published rule is PER symbol: 6% hash + 6% ellipsis each pass
    # the 10% gate even though pooled they would not
    mixed = " ".join(["w#"] * 6 + ["w..."] * 6 + ["w"] * 88)
    out = _gopher_map(spark, [(2, mixed)], min_words=10)
    assert out[2]["n_hash_symbols"] == 6
    assert out[2]["n_ellipsis_symbols"] == 6
    assert out[2]["flag_symbol_ratio"]


def test_gopher_ellipsis_and_bullet_lines(spark):
    bullets = "\n".join(["- item %d" % i for i in range(10)])
    out = _gopher_map(spark, [(1, bullets)], min_words=1)
    assert out[1]["n_bullet_lines"] == 10
    assert not out[1]["flag_bullet_lines"]
    dots = "\n".join(["line %d goes on..." % i for i in range(10)])
    out = _gopher_map(spark, [(2, dots)], min_words=1)
    assert out[2]["n_ellipsis_lines"] == 10
    assert not out[2]["flag_ellipsis_lines"]


def test_gopher_alpha_words_and_mean_length(spark):
    nums = " ".join(["12345"] * 40 + ["word"] * 8)
    out = _gopher_map(spark, [(1, nums)], min_words=10)
    # 8/48 alpha words < 80%
    assert not out[1]["flag_alpha_words"]
    longs = " ".join(["extraordinarily"] * 60)
    out = _gopher_map(spark, [(2, longs)], min_words=10)
    # mean word length 15 > 10
    assert not out[2]["flag_mean_word_len"]
    shorts = " ".join(["a", "an", "i"] * 40)
    out = _gopher_map(spark, [(3, shorts)], min_words=10)
    # mean word length < 3
    assert not out[3]["flag_mean_word_len"]


def test_gopher_stop_word_gate(spark):
    nostops = " ".join(["data pipeline reads parquet shards"] * 12)
    out = _gopher_map(spark, [(1, nostops)], min_words=10)
    assert out[1]["n_stop_words"] == 0
    assert not out[1]["flag_stop_words"]


# ---------------------------------------------------------------------------
# C4 cleaning heuristics (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------


def _c4_map(spark, rows, **kw):
    from biomedical_data_integration_spark.operators.text import c4_clean

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in c4_clean(df, **kw).collect()}


def test_c4_keeps_terminal_punct_lines_in_order(spark):
    text = "\n".join(
        [
            "This is a proper first sentence with enough words.",
            "short line.",                       # < 5 words -> dropped
            "No terminal punctuation on this line here",  # dropped
            "A second proper sentence keeps the page alive!",
            'He said "this quoted line also counts fine."',
            "And one final closing sentence to be safe?",
        ]
    )
    out = _c4_map(spark, [(1, text)])
    r = out[1]
    assert r["n_lines_kept"] == 4 and r["n_lines_dropped"] == 2
    lines = r["text_clean"].split("\n")
    assert lines[0].startswith("This is a proper")
    assert lines[1].startswith("A second proper")   # order preserved
    assert r["keep_c4"] and r["n_sentences"] >= 3


def test_c4_page_gates(spark):
    good = "\n".join(["Sentence number %d is long enough today." % i
                      for i in range(4)])
    out = _c4_map(
        spark,
        [
            (1, good),
            (2, good + "\nSome Lorem Ipsum filler text appears here."),
            (3, good + "\nvar config = { key: value } is code."),
            (4, "Only one proper sentence lives on this page."),
        ],
    )
    assert out[1]["keep_c4"]
    assert not out[2]["keep_c4"], "lorem ipsum page must drop"
    assert not out[3]["keep_c4"], "curly-brace page must drop"
    assert not out[4]["keep_c4"], "fewer than 3 sentences must drop"
    # line filtering still reported for dropped pages
    assert out[4]["n_lines_kept"] == 1


def test_c4_terminal_punct_toggle(spark):
    text = "five good words but no punctuation"
    out = _c4_map(spark, [(1, text)])
    assert out[1]["n_lines_kept"] == 0
    out = _c4_map(spark, [(1, text)], require_terminal_punct=False)
    assert out[1]["n_lines_kept"] == 1


def test_c4_plan_is_projection_only(spark):
    from biomedical_data_integration_spark.operators.text import c4_clean

    df = spark.createDataFrame([(1, "a.")], ["doc_id", "text"])
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# full Gopher repetition suite (Rae et al. 2021 Table A1)
# ---------------------------------------------------------------------------


def _rep_map(spark, rows, **kw):
    from biomedical_data_integration_spark.operators.text import (
        gopher_repetition,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in gopher_repetition(df, **kw).collect()}


def test_gopher_repetition_clean_doc_passes(spark):
    # long enough that a singleton n-gram stays under every threshold
    # (the published rules assume the >= 50-word Gopher page gate)
    text = " ".join(f"word{i:02d}" for i in range(60))
    out = _rep_map(spark, [(1, text)])
    r = out[1]
    assert r["passes_repetition"]
    assert r["dup_5_gram_char_frac"] == 0.0
    assert r["dup_line_frac"] == 0.0


def test_gopher_repetition_duplicate_lines_and_chars(spark):
    text = "\n".join(["the same line again"] * 4 + ["one unique closing line"])
    out = _rep_map(spark, [(1, text)])
    r = out[1]
    # 4 of 5 lines are copies of one value -> dup fraction 0.8
    assert r["dup_line_frac"] == 0.8
    assert not r["flag_dup_line_frac"]
    # char-weighted: 4*19 / (4*19 + 23)
    assert r["dup_line_char_frac"] == round(76 / 99, 6)
    assert not r["flag_dup_line_char_frac"]
    assert not r["passes_repetition"]


def test_gopher_repetition_top_ngram_fraction(spark):
    # "very top pair" dominates: top 2-gram "very top" occurs 6 times
    text = " ".join(["very top"] * 6) + " tail words differ here"
    out = _rep_map(spark, [(1, text)], top_ngrams=(2,), dup_ngrams=(5,))
    r = out[1]
    toks = text.split()
    tchars = sum(len(t) for t in toks)
    assert r["n_token_chars"] == tchars
    # top 2-gram by (count desc, gram asc): "top very" occurs 5, "very top" 6
    assert r["top_2_gram_char_frac"] == round(6 * len("verytop") / tchars, 6)
    assert not r["flag_top_2_gram_char_frac"]


def test_gopher_repetition_dup_ngram_fraction(spark):
    # a repeated 5-gram block: "a b c d e" x3 then unique tail
    text = "a b c d e " * 3 + "u v w x y z q r s t"
    out = _rep_map(spark, [(1, text)], top_ngrams=(2,), dup_ngrams=(5,))
    r = out[1]
    assert r["dup_5_gram_char_frac"] > 0
    assert not r["flag_dup_5_gram_char_frac"]
    # short doc yields NO fake n-grams (strict n-gram form) — though its
    # top-2-gram fraction is legitimately 1.0 (Gopher word-count-gates
    # such pages out before the repetition rules apply)
    out = _rep_map(spark, [(2, "tiny doc")], top_ngrams=(2,), dup_ngrams=(5,))
    assert out[2]["dup_5_gram_char_frac"] == 0.0
    assert out[2]["flag_dup_5_gram_char_frac"]
    assert out[2]["top_2_gram_char_frac"] == 1.0
    assert not out[2]["passes_repetition"]


def test_gopher_repetition_matches_independent_replay(spark):
    """Python replay of the Dolma-style formulas on random-ish text."""
    import random

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(8)
    ]
    out = _rep_map(spark, rows, top_ngrams=(2, 3), dup_ngrams=(5,))
    from collections import Counter

    for did, text in rows:
        toks = text.lower().split()
        tchars = sum(len(t) for t in toks)
        r = out[did]
        assert r["n_token_chars"] == tchars
        for n, key in [(2, "top_2_gram_char_frac"), (3, "top_3_gram_char_frac")]:
            grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            c = Counter(grams)
            top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            want = round(top[1] * (len(top[0]) - (n - 1)) / tchars, 6)
            assert r[key] == want, (did, key)
        grams5 = [" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)]
        c5 = Counter(grams5)
        dup = sum(cnt * (len(g) - 4) for g, cnt in c5.items() if cnt >= 2)
        assert r["dup_5_gram_char_frac"] == round(dup / tchars, 6)


def test_gopher_repetition_plan_is_shuffle_free(spark):
    """The sorted-run-fold form must stay a pure projection: every
    measure is per-document, so no count ever leaves the row (the first
    implementation's tagged-ngram explode shuffled ~9x corpus tokens —
    the steepest scale curve of round 9 until this rewrite)."""
    from biomedical_data_integration_spark.operators.text import (
        gopher_repetition,
    )

    df = spark.createDataFrame([(1, "a b a b c d e f g h")], ["doc_id", "text"])
    plan = (
        gopher_repetition(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# in-engine quality-classifier training (round-10)
# ---------------------------------------------------------------------------


def _clf_docs(spark):
    rows = [
        # high-quality: alphabetic, stopwordy, diverse
        (1, "the quick brown fox jumps over the lazy dog with great vigor"),
        (2, "a curious reader will have found that these words flow well"),
        (3, "science and reason be the tools that have shaped our world"),
        # low-quality: digit/punct heavy, repetitive
        (4, "111 222 333 444 !!! ??? ,,, 555 666 777 888 999 000 111"),
        (5, "buy buy buy buy buy 99.99 $$$ 99.99 buy buy buy buy buy"),
        (6, "xxxx 1234 xxxx 1234 xxxx 1234 xxxx 1234 xxxx 1234 xxxx"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_quality_classifier_matches_naive_replay(spark):
    """The distributed GD must equal a pure-python replay on collected
    features — exact integer parity, not approximate."""
    import math

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        QUALITY_CLF_FEATURES,
        quality_features,
        train_quality_classifier,
    )

    df = _clf_docs(spark)
    label = (F.col("doc_id") <= 3).cast("int")
    got = train_quality_classifier(df, label, iters=4, lr=10.0)

    feats = quality_features(df).select(
        "doc_id", *QUALITY_CLF_FEATURES
    ).collect()
    rows = [
        (
            1 if r["doc_id"] <= 3 else 0,
            [
                int(math.floor(r[f] * 1_000_000 + 0.5))
                for f in QUALITY_CLF_FEATURES
            ],
        )
        for r in feats
    ]
    n = len(rows)
    means = [
        sum(f[i] for _, f in rows) // n
        for i in range(len(QUALITY_CLF_FEATURES))
    ]
    w = [0] * len(QUALITY_CLF_FEATURES)
    b = 0
    lrm = 10_000_000

    def tdiv(x, d):
        q = abs(x) // d
        return -q if x < 0 else q

    for _ in range(4):
        gb = 0
        g = [0] * len(w)
        for y, f in rows:
            z = (b * 10**6 + sum(
                w[i] * (f[i] - means[i]) for i in range(len(w))
            )) / 1e12
            p = int(math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5))
            e = p - y * 10**6
            gb += e
            for i in range(len(w)):
                g[i] += e * (f[i] - means[i])
        for i in range(len(w)):
            w[i] -= tdiv(lrm * g[i], n * 10**12)
        b -= tdiv(lrm * gb, n * 10**6)

    assert got["bias"] == b
    assert [got["weights"][f] for f in QUALITY_CLF_FEATURES] == w
    assert [got["means"][f] for f in QUALITY_CLF_FEATURES] == means
    assert got["n"] == n


def test_quality_classifier_separates_and_serves(spark):
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        score_quality_classifier,
        train_quality_classifier,
    )

    df = _clf_docs(spark)
    label = (F.col("doc_id") <= 3).cast("int")
    model = train_quality_classifier(df, label, iters=8, lr=10.0)
    scores = {
        r["doc_id"]: r["score_micro"]
        for r in score_quality_classifier(df, model).collect()
    }
    # trained filter separates the obviously-clean from the obviously-junk
    assert min(scores[d] for d in (1, 2, 3)) > max(
        scores[d] for d in (4, 5, 6)
    )
    # serving is a pure projection — no python exec, no shuffle
    plan = (
        score_quality_classifier(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_train_quality_classifier_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        train_quality_classifier,
    )

    df = _clf_docs(spark)
    with _pytest.raises(ValueError, match="iters"):
        train_quality_classifier(df, F.lit(1), iters=0)
    with _pytest.raises(ValueError, match="lr"):
        train_quality_classifier(df, F.lit(1), lr=0.0)
    with _pytest.raises(ValueError, match="empty"):
        train_quality_classifier(df.where("doc_id > 99"), F.lit(1))


def test_train_hashed_classifier_matches_naive_replay(spark):
    """Distributed preconditioned GD == pure-python replay, exact
    integers end to end."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        score_hashed_text_classifier,
        train_hashed_text_classifier,
    )

    rows = [
        (1, "join join filter sort"),
        (2, "join merge join group join"),
        (3, "filter sort group merge"),
        (4, "sort sort filter merge group"),
        (5, "join scan"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    y_of = {i: 1 if t.split().count("join") >= 2 else 0 for i, t in rows}
    nb, iters, lr = 16, 3, 0.4
    got = train_hashed_text_classifier(
        df, (F.col("doc_id").isin([1, 2])).cast("int"),
        n_buckets=nb, iters=iters, lr=lr,
    )
    # naive replay
    def bucket(t):
        return int(hashlib.md5(f"hclf|{t}".encode()).hexdigest()[:15], 16) % nb

    feats = {}
    for i, t in rows:
        toks = t.split()
        cnt = {}
        for tok in toks:
            b = bucket(tok)
            cnt[b] = cnt.get(b, 0) + 1
        n = len(toks)
        feats[i] = {b: (c * nb * 1_000_000) // n for b, c in cnt.items()} if n else {}
    h = {}
    for fv in feats.values():
        for b, f in fv.items():
            h[b] = h.get(b, 0) + f * f
    lrm = int(lr * 1_000_000)
    w = [0] * nb
    bias = 0
    n = len(rows)

    def tdiv(x, d):
        q = abs(x) // d
        return -q if x < 0 else q

    labels = {i: 1 if i in (1, 2) else 0 for i, _ in rows}
    for _ in range(iters):
        errs = {}
        for i, _t in rows:
            z = bias * 10**6 + sum(w[b] * f for b, f in feats[i].items())
            p = int(math.floor(1.0 / (1.0 + math.exp(-z / 1e12)) * 1e6 + 0.5))
            errs[i] = p - labels[i] * 10**6
        g = {}
        for i, _t in rows:
            for b, f in feats[i].items():
                g[b] = g.get(b, 0) + errs[i] * f
        gb = sum(errs.values())
        for b in range(nb):
            if h.get(b, 0) > 0:
                w[b] -= tdiv(lrm * g.get(b, 0), h[b])
        bias -= tdiv(lrm * gb, n * 10**6)
    assert got["weights"] == w
    assert got["bias"] == bias and got["n"] == n
    # scoring face matches the replay's final pass
    scores = {
        r["doc_id"]: r["score_micro"]
        for r in score_hashed_text_classifier(df, got).collect()
    }
    for i, _t in rows:
        z = bias * 10**6 + sum(w[b] * f for b, f in feats[i].items())
        p = int(math.floor(1.0 / (1.0 + math.exp(-z / 1e12)) * 1e6 + 0.5))
        assert scores[i] == p


def test_hashed_classifier_learns_token_identity(spark):
    """The hashed model must learn a keyword concept on the real corpus
    far above majority — the capability the ratio-feature quality twin
    lacks by construction."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        score_hashed_text_classifier,
        tokens_expr,
        train_hashed_text_classifier,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    njoin = F.size(
        F.filter(tokens_expr(F.col("text")), lambda t: t == F.lit("join"))
    )
    y = (njoin >= 2).cast("int")
    lab = {
        r["doc_id"]: r["__y"]
        for r in docs.select("doc_id", y.alias("__y")).collect()
    }
    model = train_hashed_text_classifier(
        docs, y, n_buckets=256, iters=8, lr=0.4
    )
    scores = {
        r["doc_id"]: r["score_micro"]
        for r in score_hashed_text_classifier(docs, model).collect()
    }
    acc = sum(
        (scores[d] > 500_000) == bool(lab[d]) for d in lab
    ) / len(lab)
    majority = max(
        sum(lab.values()), len(lab) - sum(lab.values())
    ) / len(lab)
    assert acc >= majority + 0.25


def test_hclf_feature_arrays_match_naive(spark):
    """Round-12 optimization gate: the shuffle-free run-length feature
    build (_hclf_feature_arrays) produces EXACTLY the (bucket, f)
    multiset a naive python replay computes — including the bias entry
    for every document (empty and null text included), sorted-bucket
    order, and the exact integer ratio f = (c*nb*1e6) // nt."""
    import hashlib

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        _hclf_feature_arrays,
    )

    rows = [
        (1, "join join filter sort"),
        (2, "join merge join group join"),
        (3, ""),
        (4, None),
        (5, "scan"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string").select(
        "doc_id", "text", F.lit(0).cast("bigint").alias("__y")
    )
    nb = 16
    got = {
        r["id"]: [(e["bucket"], e["f"]) for e in r["__feats"]]
        for r in _hclf_feature_arrays(df, nb, "text", "doc_id").collect()
    }

    def bucket(t):
        return int(
            hashlib.md5(f"hclf|{t}".encode()).hexdigest()[:15], 16
        ) % nb

    for i, t in rows:
        toks = t.split() if t else []
        cnt: dict = {}
        for tok in toks:
            cnt[bucket(tok)] = cnt.get(bucket(tok), 0) + 1
        n = len(toks)
        want = sorted(
            (b, (c * nb * 1_000_000) // n) for b, c in cnt.items()
        ) + [(-1, 1_000_000)]
        assert got[i] == want, (i, got[i], want)


def test_train_hashed_classifier_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        train_hashed_text_classifier,
    )

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="iters"):
        train_hashed_text_classifier(df, F.lit(1), iters=0)
    with _pytest.raises(ValueError, match="n_buckets"):
        train_hashed_text_classifier(df, F.lit(1), n_buckets=1)
    with _pytest.raises(ValueError, match="empty"):
        train_hashed_text_classifier(df.where("doc_id > 9"), F.lit(1))


def test_save_load_classifier_roundtrip_and_serves_identically(spark):
    """save_classifier -> load_classifier must return the exact model
    dict (integer micro-units round-trip losslessly) for BOTH model
    shapes, and the loaded model must score bit-identically."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        load_classifier,
        save_classifier,
        score_hashed_text_classifier,
        score_quality_classifier,
        tokens_expr,
        train_hashed_text_classifier,
        train_quality_classifier,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)
    base = tempfile.mkdtemp()

    label = (F.col("quality_score") >= F.lit(0.66)).cast("int")
    qm = train_quality_classifier(docs, label, iters=2, lr=10.0)
    save_classifier(spark, qm, os.path.join(base, "q"))
    qm2 = load_classifier(spark, os.path.join(base, "q"))
    assert qm2 == qm
    want = score_quality_classifier(docs, qm).orderBy("doc_id").collect()
    got = score_quality_classifier(docs, qm2).orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    njoin = F.size(
        F.filter(tokens_expr(F.col("text")), lambda t: t == F.lit("join"))
    )
    hm = train_hashed_text_classifier(
        docs, (njoin >= 2).cast("int"), n_buckets=32, iters=2, lr=0.4
    )
    save_classifier(spark, hm, os.path.join(base, "h"))
    hm2 = load_classifier(spark, os.path.join(base, "h"))
    assert hm2 == hm
    wanth = score_hashed_text_classifier(docs, hm).orderBy("doc_id").collect()
    goth = score_hashed_text_classifier(docs, hm2).orderBy("doc_id").collect()
    assert [tuple(r) for r in goth] == [tuple(r) for r in wanth]


def test_load_classifier_empty_raises(spark):
    import os
    import tempfile

    import pytest as _pytest

    from biomedical_data_integration_spark.operators.text import (
        load_classifier,
    )

    base = tempfile.mkdtemp()
    spark.createDataFrame(
        [], "weights_map map<string,bigint>, weights_arr array<bigint>, "
        "bias bigint, means map<string,bigint>, n bigint"
    ).write.parquet(os.path.join(base, "m"))
    with _pytest.raises(ValueError, match="no model row"):
        load_classifier(spark, os.path.join(base, "m"))


def test_classifier_warm_start_equals_one_shot(spark):
    """Warm start (round-11 verdict item 5): cold-K1 -> save -> load ->
    warm-K2 must equal one-shot K1+K2 training BIT-FOR-BIT on the same
    corpus — GD state is exactly (w, bias), and micro-int weights
    round-trip the sidecar exactly."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        load_classifier,
        save_classifier,
        tokens_expr,
        train_hashed_text_classifier,
        train_quality_classifier,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    base = tempfile.mkdtemp()

    label = (F.length("text") > F.lit(400)).cast("int")
    cold = train_quality_classifier(docs, label, iters=2, lr=10.0)
    qpath = os.path.join(base, "q")
    save_classifier(spark, cold, qpath)
    warm = train_quality_classifier(
        docs, label, iters=2, lr=10.0, init=load_classifier(spark, qpath)
    )
    one_shot = train_quality_classifier(docs, label, iters=4, lr=10.0)
    assert warm == one_shot

    njoin = F.size(
        F.filter(tokens_expr(F.col("text")), lambda t: t == F.lit("join"))
    )
    hlabel = (njoin >= 2).cast("int")
    hcold = train_hashed_text_classifier(
        docs, hlabel, n_buckets=64, iters=2, lr=0.4
    )
    hpath = os.path.join(base, "h")
    save_classifier(spark, hcold, hpath)
    hwarm = train_hashed_text_classifier(
        docs, hlabel, n_buckets=64, iters=2, lr=0.4,
        init=load_classifier(spark, hpath),
    )
    hone = train_hashed_text_classifier(
        docs, hlabel, n_buckets=64, iters=4, lr=0.4
    )
    assert hwarm == hone

    # wrong-shape init must refuse
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucket weights"):
        train_hashed_text_classifier(
            docs, hlabel, n_buckets=128, iters=1,
            init=load_classifier(spark, hpath),
        )
