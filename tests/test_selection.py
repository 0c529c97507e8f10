"""DSIR importance weighting and duplicate n-gram coverage."""

import math

import pytest

from biomedical_data_integration_spark.operators.dedup import (
    duplicate_ngram_coverage,
)
from biomedical_data_integration_spark.operators.sampling import dsir_weights


def test_dsir_targetlike_docs_score_higher(spark):
    target = spark.createDataFrame(
        [(i, "medical clinical trial patient outcome") for i in range(5)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [
            (1, "medical clinical trial patient outcome study"),
            (2, "buy cheap watches click here now"),
            (3, "clinical patient data medical"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in dsir_weights(raw, target, n_buckets=64).collect()}
    assert got[1]["avg_log_ratio"] > got[2]["avg_log_ratio"]
    assert got[3]["avg_log_ratio"] > got[2]["avg_log_ratio"]
    assert got[1]["n_tokens"] == 6


def test_dsir_empty_doc_scores_null(spark):
    target = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    raw = spark.createDataFrame([(1, "a b"), (2, "   ")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    assert got[2]["n_tokens"] == 0
    assert got[2]["log_weight"] is None
    assert got[2]["avg_log_ratio"] is None


def test_dsir_log_weight_is_quantized_sum(spark):
    """log_weight equals n_tokens * quantized per-bucket ratios summed —
    check the identical-token case where the math is hand-computable."""
    target = spark.createDataFrame([(1, "x x x")], ["doc_id", "text"])
    raw = spark.createDataFrame([(1, "x x")], ["doc_id", "text"])
    row = dsir_weights(raw, target, n_buckets=16, smoothing=0.5).collect()[0]
    # one bucket holds all mass: p_t = (3+0.5)/(3+8), p_r = (2+0.5)/(2+8)
    lr = math.log((3 + 0.5) / (3 + 8.0)) - math.log((2 + 0.5) / (2 + 8.0))
    lr6 = math.floor(lr * 1e6 + 0.5)
    assert row["log_weight"] == pytest.approx(2 * lr6 / 1e6, abs=1e-9)
    assert row["avg_log_ratio"] == pytest.approx(lr6 / 1e6, abs=1e-9)


def test_dsir_validates_buckets(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dsir_weights(df, df, n_buckets=1)


def test_duplicate_ngram_coverage_flags_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "subscribe to our newsletter for daily updates"),
            (2, "subscribe to our newsletter for weekly offers"),
            (3, "entirely unique prose about alpine marmots today"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in duplicate_ngram_coverage(docs, shingle_words=3).collect()
    }
    # docs 1/2 share the 'subscribe to our' ... 'our newsletter for' prefix run
    assert got[1]["dup_coverage"] > 0.5
    assert got[2]["dup_coverage"] > 0.5
    assert got[3]["dup_coverage"] == 0.0
    assert got[3]["n_dup_shingles"] == 0
    # coverage is n_dup / n_shingles exactly
    for r in got.values():
        assert r["dup_coverage"] == pytest.approx(
            round(r["n_dup_shingles"] / r["n_shingles"], 6), abs=1e-9
        )


def test_duplicate_ngram_coverage_exact_dup_is_full(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two three four")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in duplicate_ngram_coverage(docs).collect()}
    assert got[1]["dup_coverage"] == 1.0 and got[2]["dup_coverage"] == 1.0
