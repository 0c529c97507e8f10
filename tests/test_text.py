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
