"""PSI drift scoring and k-anonymity / l-diversity auditing."""

import math

import pytest

from biomedical_data_integration_spark.operators.profiling import (
    k_anonymity,
    psi_drift,
    suppress_below_k,
)


def test_psi_identical_distributions_near_zero(spark):
    rows = [(i, float(i % 20)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "value"])
    out = psi_drift(df, df, "value", n_bins=4).collect()
    assert all(r["psi_total"] == pytest.approx(0.0, abs=1e-6) for r in out)
    assert all(r["n_baseline"] == r["n_current"] for r in out)


def test_psi_shifted_distribution_is_positive_and_matches_formula(spark):
    base = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], ["id", "value"]
    )
    cur = spark.createDataFrame(
        [(i, float(i % 10) + 6.0) for i in range(100)], ["id", "value"]
    )
    rows = {r["bin"]: r for r in psi_drift(base, cur, "value", n_bins=4).collect()}
    total = next(iter(rows.values()))["psi_total"]
    assert total > 0.25  # strong shift
    # recompute one bin's term in plain python
    nb = sum(r["n_baseline"] for r in rows.values())
    nc = sum(r["n_current"] for r in rows.values())
    for r in rows.values():
        pb = (r["n_baseline"] + 0.5) / (nb + 2.0)
        pc = (r["n_current"] + 0.5) / (nc + 2.0)
        expect = math.floor((pb - pc) * math.log(pb / pc) * 1e6 + 0.5) / 1e6
        assert r["psi_term"] == pytest.approx(expect, abs=1e-9)
    assert total == pytest.approx(
        sum(r["psi_term"] for r in rows.values()), abs=1e-6
    )


def test_psi_rejects_tiny_bins(spark):
    df = spark.createDataFrame([(1, 1.0)], ["id", "value"])
    with pytest.raises(ValueError):
        psi_drift(df, df, "value", n_bins=1)


def _people(spark):
    return spark.createDataFrame(
        [
            (1, "10001", 30, "flu"),
            (2, "10001", 30, "cold"),
            (3, "10001", 30, "flu"),
            (4, "10002", 40, "hiv"),
            (5, "10002", 40, "hiv"),
            (6, "10003", 50, "flu"),
        ],
        ["id", "zip", "age", "diagnosis"],
    )


def test_k_anonymity_classes_and_l_diversity(spark):
    out = {
        (r["zip"], r["age"]): r
        for r in k_anonymity(
            _people(spark), ["zip", "age"], k=2, sensitive_col="diagnosis"
        ).collect()
    }
    assert out[("10001", 30)]["class_size"] == 3
    assert out[("10001", 30)]["meets_k"] is True
    assert out[("10001", 30)]["l_diversity"] == 2
    assert out[("10002", 40)]["l_diversity"] == 1  # homogeneous: l-div attack
    assert out[("10003", 50)]["meets_k"] is False


def test_suppress_below_k_keeps_only_large_classes(spark):
    kept = suppress_below_k(_people(spark), ["zip", "age"], k=2)
    ids = sorted(r["id"] for r in kept.collect())
    assert ids == [1, 2, 3, 4, 5]


def test_k_anonymity_validates_args(spark):
    with pytest.raises(ValueError):
        k_anonymity(_people(spark), [], k=2)
    with pytest.raises(ValueError):
        k_anonymity(_people(spark), ["zip"], k=0)
