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


def test_ks_statistic_identical_is_zero(spark):
    from biomedical_data_integration_spark.operators.profiling import ks_statistic

    df = spark.createDataFrame([(i, float(i % 10)) for i in range(100)], ["id", "v"])
    row = ks_statistic(df, df, "v").collect()[0]
    assert row["ks_d"] == 0.0
    assert row["n_a"] == 100 and row["n_b"] == 100


def test_ks_statistic_shift_detected(spark):
    from biomedical_data_integration_spark.operators.profiling import ks_statistic

    a = spark.createDataFrame([(i, float(i % 10)) for i in range(100)], ["id", "v"])
    b = spark.createDataFrame(
        [(i, float(i % 10) + 5.0) for i in range(80)], ["id", "v"]
    )
    row = ks_statistic(a, b, "v").collect()[0]
    # disjoint-ish supports: F_a(4.x) = 0.5, F_b(4.x) = 0 -> D = 0.5
    assert row["ks_d"] == pytest.approx(0.5, abs=1e-6)
    assert row["ks_at_value"] == 4.0


def test_ks_matches_manual_two_sample(spark):
    from biomedical_data_integration_spark.operators.profiling import ks_statistic

    av = [1.0, 2.0, 2.0, 3.0]
    bv = [2.0, 3.0, 4.0]
    a = spark.createDataFrame([(i, v) for i, v in enumerate(av)], ["id", "v"])
    b = spark.createDataFrame([(i, v) for i, v in enumerate(bv)], ["id", "v"])
    row = ks_statistic(a, b, "v").collect()[0]
    pooled = sorted(set(av + bv))
    want = max(
        abs(
            sum(1 for x in av if x <= t) / len(av)
            - sum(1 for x in bv if x <= t) / len(bv)
        )
        for t in pooled
    )
    assert row["ks_d"] == pytest.approx(round(want, 6), abs=1e-9)


def test_quantile_transform_ranks_and_ties(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        quantile_transform,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 40.0), (5, None)], ["id", "v"]
    )
    got = {r["id"]: r["v_q"] for r in quantile_transform(df, "v").collect()}
    assert got[1] == 0.0
    # ties at rank 2,3 -> avg rank 2.5 -> (2.5-1)/3 = 0.5
    assert got[2] == got[3] == pytest.approx(0.5, abs=1e-6)
    assert got[4] == 1.0
    assert got[5] is None


def test_quantile_transform_grouped_and_singleton(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        quantile_transform,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0)], ["g", "v"]
    )
    got = {
        (r["g"], r["v"]): r["v_q"]
        for r in quantile_transform(df, "v", group_col="g").collect()
    }
    assert got[("a", 1.0)] == 0.0 and got[("a", 2.0)] == 1.0
    assert got[("b", 9.0)] == 0.5  # singleton midpoint


def test_quantile_transform_survives_internal_name_collision(spark):
    """An input that already carries __v / __q columns must neither
    make the rank join ambiguous nor lose those columns (ADVICE round
    8: the old ungrouped path joined raw df against internal names)."""
    from biomedical_data_integration_spark.operators.profiling import (
        quantile_transform,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "a", "b"), (2, 20.0, "c", "d"), (3, 40.0, "e", "f")],
        ["id", "v", "__v", "__q"],
    )
    out = quantile_transform(df, "v")
    assert "__v" in out.columns and "__q" in out.columns
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["__v"] == "a" and rows[1]["__q"] == "b"
    assert rows[1]["v_q"] == 0.0 and rows[3]["v_q"] == 1.0
