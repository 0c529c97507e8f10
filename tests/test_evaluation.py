"""Exact binary AUC and calibration reporting."""

import math

import pytest

from biomedical_data_integration_spark.operators.evaluation import (
    binary_auc,
    calibration_report,
)


def test_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], ["score", "label"]
    )
    assert binary_auc(df, "score", "label").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)], ["score", "label"]
    )
    assert binary_auc(inv, "score", "label").collect()[0]["auc"] == 0.0


def test_auc_matches_sklearn_formula_with_ties(spark):
    rows = [(0.5, 1), (0.5, 0), (0.3, 0), (0.7, 1), (0.5, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, ["score", "label"])
    got = binary_auc(df, "score", "label").collect()[0]
    # manual Mann-Whitney with average ranks
    scores = sorted(r[0] for r in rows)
    import collections

    first = {}
    for i, s in enumerate(scores, 1):
        first.setdefault(s, i)
    cnt = collections.Counter(scores)
    avg_rank = {s: first[s] + (cnt[s] - 1) / 2 for s in cnt}
    rp = sum(avg_rank[s] for s, y in rows if y == 1)
    npos = sum(1 for _, y in rows if y == 1)
    nneg = len(rows) - npos
    want = (rp - npos * (npos + 1) / 2) / (npos * nneg)
    assert got["auc"] == pytest.approx(
        math.floor(want * 1e6 + 0.5) / 1e6, abs=1e-9
    )
    assert got["n_pos"] == 3 and got["n_neg"] == 3


def test_auc_degenerate_groups_null(spark):
    df = spark.createDataFrame(
        [("a", 0.5, 1), ("a", 0.6, 1), ("b", 0.5, 1), ("b", 0.1, 0)],
        ["g", "score", "label"],
    )
    got = {r["g"]: r["auc"] for r in binary_auc(df, "score", "label", "g").collect()}
    assert got["a"] is None  # no negatives
    assert got["b"] == 1.0


def test_calibration_report_golden(spark):
    df = spark.createDataFrame(
        [(0.1, 0), (0.1, 0), (0.9, 1), (0.9, 0)], ["score", "label"]
    )
    rows = {r["bin"]: r for r in calibration_report(df, "score", "label", 10).collect()}
    lo, hi = rows[1], rows[9]
    assert lo["n"] == 2 and lo["mean_score"] == pytest.approx(0.1)
    assert lo["frac_positive"] == 0.0
    assert hi["frac_positive"] == 0.5
    # ece = 0.5*|0.1-0| + 0.5*|0.9-0.5| = 0.05 + 0.2 = 0.25
    assert hi["ece_total"] == pytest.approx(0.25, abs=1e-6)
    assert lo["ece_total"] == hi["ece_total"]


def test_calibration_score_1_lands_in_last_bin(spark):
    df = spark.createDataFrame([(1.0, 1)], ["score", "label"])
    assert calibration_report(df, "score", "label", 10).collect()[0]["bin"] == 9


def test_calibration_validates(spark):
    df = spark.createDataFrame([(0.5, 1)], ["score", "label"])
    with pytest.raises(ValueError):
        calibration_report(df, "score", "label", 0)
