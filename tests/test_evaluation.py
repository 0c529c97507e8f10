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


def test_group_linregress_exact_line(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        group_linregress,
    )

    # y = 2x + 1 exactly
    df = spark.createDataFrame(
        [("a", x, 2.0 * x + 1.0) for x in range(10)], ["g", "x", "y"]
    )
    r = group_linregress(df, "x", "y", group_col="g").collect()[0]
    assert r["slope"] == pytest.approx(2.0, abs=1e-6)
    assert r["intercept"] == pytest.approx(1.0, abs=1e-6)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)
    assert r["n"] == 10


def test_group_linregress_matches_numpy(spark):
    import numpy as np

    from biomedical_data_integration_spark.operators.profiling import (
        group_linregress,
    )

    xs = list(range(20))
    ys = [round(3.5 * x - 7 + ((x * 37) % 11 - 5), 2) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    r = group_linregress(df, "x", "y").collect()[0]
    ys_q = [round(y, 2) for y in ys]
    slope, intercept = np.polyfit(xs, ys_q, 1)
    assert r["slope"] == pytest.approx(slope, abs=1e-4)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-4)
    corr = np.corrcoef(xs, ys_q)[0, 1]
    assert r["r2"] == pytest.approx(corr**2, abs=1e-4)


def test_group_linregress_degenerate_x(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        group_linregress,
    )

    df = spark.createDataFrame([(5, 1.0), (5, 2.0)], ["x", "y"])
    r = group_linregress(df, "x", "y").collect()[0]
    assert r["slope"] is None and r["r2"] is None


def test_group_linregress_validates(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        group_linregress,
    )

    df = spark.createDataFrame([(1, 1.0)], ["x", "y"])
    with pytest.raises(ValueError):
        group_linregress(df, "x", "y", y_scale=9)


def test_regression_report_golden(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        regression_report,
    )

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 4.0), (3.0, 3.0), (6.0, 4.0)],
        "pred double, label double",
    )
    r = regression_report(df, "pred", "label").collect()[0]
    # errors: 0, -2, 0, 2 -> mae 1, rmse sqrt(2), bias 0
    assert r["n"] == 4
    assert abs(r["mae"] - 1.0) < 1e-6
    assert abs(r["rmse"] - 2.0 ** 0.5) < 1e-6
    assert abs(r["bias"]) < 1e-6
    # sst = sum((y - 3)^2) = 4+1+0+1 = 6, sse = 8 -> r2 = 1 - 8/6
    assert abs(r["r2"] - (1 - 8 / 6)) < 1e-6


def test_regression_report_groups_and_degenerate(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        regression_report,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 2.0), ("b", 5.0, 7.0), ("b", 6.0, 7.0)],
        "g string, pred double, label double",
    )
    out = {r["g"]: r for r in regression_report(df, "pred", "label", "g").collect()}
    assert out["a"]["mae"] == 0.0 and out["a"]["r2"] == 1.0
    # constant labels: r2 undefined -> NULL, other metrics still real
    assert out["b"]["r2"] is None
    assert abs(out["b"]["mae"] - 1.5) < 1e-6
    assert abs(out["b"]["bias"] + 1.5) < 1e-6


def test_regression_report_large_magnitudes_no_overflow(spark):
    # 5-digit prices at scale 4: a lone squared cell exceeds int64 —
    # the decimal(38,0) path must stay exact
    from biomedical_data_integration_spark.operators.evaluation import (
        regression_report,
    )

    rows = [(float(400000 + i), float(400000 - i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "pred double, label double")
    r = regression_report(df, "pred", "label", scale=4).collect()[0]
    # errors are exactly 2i -> mae = mean(2i) = 999
    assert abs(r["mae"] - 999.0) < 1e-3


def test_ab_test_report_golden(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        ab_test_report,
    )

    rows = [("A", float(v)) for v in (10, 12, 14, 0)] + [
        ("B", float(v)) for v in (16, 18, 20, 22)
    ]
    df = spark.createDataFrame(rows, "variant string, v double")
    r = ab_test_report(df, "variant", "v", "A", "B").collect()[0]
    assert (r["n_c"], r["n_t"]) == (4, 4)
    assert abs(r["mean_c"] - 9.0) < 1e-6 and abs(r["mean_t"] - 19.0) < 1e-6
    assert abs(r["lift"] - 10.0) < 1e-6
    # welch: var_c = 116/3, var_t = 20/3 -> se = sqrt(136/12)
    import math

    t_ref = 10.0 / math.sqrt((116 / 3) / 4 + (20 / 3) / 4)
    assert abs(r["t_welch"] - t_ref) < 1e-5
    # conversions: 3/4 vs 4/4, pooled 7/8
    assert abs(r["conv_c"] - 0.75) < 1e-6 and r["conv_t"] == 1.0
    p = 7 / 8
    z_ref = 0.25 / math.sqrt(p * (1 - p) * (1 / 4 + 1 / 4))
    assert abs(r["z_prop"] - z_ref) < 1e-5


def test_ab_test_report_degenerate_sides(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        ab_test_report,
    )

    # single-row control: t and z are NULL, means still real
    df = spark.createDataFrame(
        [("A", 5.0), ("B", 6.0), ("B", 8.0)], "variant string, v double"
    )
    r = ab_test_report(df, "variant", "v", "A", "B").collect()[0]
    assert r["t_welch"] is None and r["z_prop"] is None
    assert abs(r["mean_t"] - 7.0) < 1e-6
    # all-converted: pooled p == 1 -> z NULL
    df = spark.createDataFrame(
        [("A", 5.0), ("A", 7.0), ("B", 6.0), ("B", 8.0)], "variant string, v double"
    )
    r = ab_test_report(df, "variant", "v", "A", "B").collect()[0]
    assert r["z_prop"] is None and r["t_welch"] is not None


def test_threshold_sweep_golden(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        threshold_sweep,
    )

    # scores: pos at .9/.7/.3, neg at .8/.2/.1
    df = spark.createDataFrame(
        [(0.9, 1), (0.7, 1), (0.3, 1), (0.8, 0), (0.2, 0), (0.1, 0)],
        "score double, label int",
    )
    rows = {
        r["threshold"]: r
        for r in threshold_sweep(df, "score", "label", [0.25, 0.75]).collect()
    }
    r = rows[0.25]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 1, 0, 2)
    assert abs(r["precision"] - 0.75) < 1e-6
    assert r["recall"] == 1.0
    assert abs(r["f1"] - 2 * 0.75 / 1.75) < 1e-6
    assert abs(r["accuracy"] - 5 / 6) < 1e-6
    r = rows[0.75]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 2, 2)
    assert abs(r["precision"] - 0.5) < 1e-6
    assert abs(r["recall"] - 1 / 3) < 1e-6


def test_threshold_sweep_boundary_is_inclusive_and_exact(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        threshold_sweep,
    )

    # score exactly AT the threshold predicts positive; 0.299999... does not
    df = spark.createDataFrame(
        [(0.3, 1), (0.299, 0), (0.301, 0)], "score double, label int"
    )
    r = threshold_sweep(df, "score", "label", [0.3]).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 0, 1)


def test_threshold_sweep_degenerate_and_errors(spark):
    import pytest
    from biomedical_data_integration_spark.operators.evaluation import (
        threshold_sweep,
    )

    # no predicted positives -> precision NULL; no actual positives -> recall NULL
    df = spark.createDataFrame([(0.1, 0), (0.2, 0)], "score double, label int")
    r = threshold_sweep(df, "score", "label", [0.5]).collect()[0]
    assert r["precision"] is None and r["recall"] is None and r["f1"] is None
    with pytest.raises(ValueError, match="at least one"):
        threshold_sweep(df, "score", "label", [])
    with pytest.raises(ValueError, match="not representable"):
        threshold_sweep(df, "score", "label", [0.12345])


def test_threshold_sweep_empty_input_keeps_grid(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        threshold_sweep,
    )

    # no valid (score, label) rows at all: every requested threshold
    # still yields a zero-count row (NULL ratios), not an empty frame
    empty = spark.createDataFrame([], "score double, label int")
    rows = sorted(
        threshold_sweep(empty, "score", "label", [0.25, 0.5, 0.75]).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [0.25, 0.5, 0.75]
    for r in rows:
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 0)
        assert r["precision"] is None and r["recall"] is None
    # all-null labels filter to nothing too — same contract
    nulls = spark.createDataFrame(
        [(0.4, None), (None, 1)], "score double, label int"
    )
    rows = threshold_sweep(nulls, "score", "label", [0.5]).collect()
    assert len(rows) == 1 and rows[0]["tp"] == 0


def test_diff_in_diff_golden(spark):
    import math

    from biomedical_data_integration_spark.operators.evaluation import (
        diff_in_diff,
    )

    # control flat 10->11 (+1 trend), treatment 10->14 (+4): DiD = +3
    rows = (
        [("t", "pre", v) for v in (9.0, 10.0, 11.0)]
        + [("t", "post", v) for v in (13.0, 14.0, 15.0)]
        + [("c", "pre", v) for v in (9.5, 10.0, 10.5)]
        + [("c", "post", v) for v in (10.5, 11.0, 11.5)]
    )
    df = spark.createDataFrame(rows, "g string, p string, v double")
    r = diff_in_diff(df, "g", "p", "v", "t", "c", "pre", "post").collect()[0]
    assert r["mean_tpre"] == 10.0 and r["mean_tpost"] == 14.0
    assert r["delta_t"] == 4.0 and r["delta_c"] == 1.0
    assert r["did"] == 3.0
    # pooled se: var/n = 1/3 (t cells), 0.25/3 (c cells)
    se = math.sqrt(1 / 3 + 1 / 3 + 0.25 / 3 + 0.25 / 3)
    assert abs(r["se_did"] - se) < 1e-5
    assert abs(r["t_did"] - 3.0 / se) < 1e-4


def test_diff_in_diff_degenerate_cell(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        diff_in_diff,
    )

    # single-row cell: point estimate stands, se/t are NULL
    rows = [("t", "pre", 1.0), ("t", "post", 2.0), ("t", "post", 2.0),
            ("c", "pre", 1.0), ("c", "pre", 1.0), ("c", "post", 1.0),
            ("c", "post", 1.0)]
    df = spark.createDataFrame(rows, "g string, p string, v double")
    r = diff_in_diff(df, "g", "p", "v", "t", "c", "pre", "post").collect()[0]
    assert r["did"] == 1.0
    assert r["se_did"] is None and r["t_did"] is None


def test_cuped_golden_vs_numpy(spark):
    import numpy as np

    from biomedical_data_integration_spark.operators.evaluation import (
        cuped_adjusted_effect,
    )

    rng = np.random.RandomState(11)
    x = np.round(rng.normal(50, 10, 200), 2)          # pre-period metric
    noise = np.round(rng.normal(0, 2, 200), 2)
    y = np.round(x * 0.8 + noise, 2)                  # strongly covariate-driven
    variant = np.array(["c"] * 100 + ["t"] * 100)
    y[100:] = np.round(y[100:] + 1.5, 2)              # true effect
    rows = [(str(v), float(yy), float(xx)) for v, yy, xx in zip(variant, y, x)]
    df = spark.createDataFrame(rows, "variant string, y double, x double")
    r = cuped_adjusted_effect(df, "variant", "y", "x", "c", "t").collect()[0]
    # raw effect = mean diff
    assert abs(r["effect_raw"] - (y[100:].mean() - y[:100].mean())) < 1e-4
    # theta from pooled moments (quantization to cents first)
    yq = np.floor(y * 100 + 0.5)
    xq = np.floor(x * 100 + 0.5)
    theta = np.cov(yq, xq, bias=True)[0, 1] / np.var(xq)
    assert abs(r["theta"] - theta) < 1e-4
    # CUPED kills most of the covariate-driven variance
    assert r["var_reduction"] > 0.9
    # adjusted effect stays near the truth, t-stat is large
    assert abs(r["effect_cuped"] - 1.5) < 0.5
    assert r["t_cuped"] > 3.0


def test_did_cuped_large_magnitude_moments_exact(spark):
    """Σq² must not wrap: values ~1e7 at scale=2 quantize to q~1e9, so
    q² ~ 1e18 and ~40 rows push the squared-moment sum past 2^63 — the
    decimal(38,0) moment contract (shared with ab_test_report) keeps it
    exact where a bigint sum silently wraps negative."""
    import math

    from biomedical_data_integration_spark.operators.evaluation import (
        cuped_adjusted_effect,
        diff_in_diff,
    )

    base = 1.0e7
    rows = []
    for i in range(40):
        jitter = float(i % 7)  # deterministic spread, sd > 0
        rows += [
            ("t", "pre", base + jitter),
            ("t", "post", base + 40.0 + jitter),
            ("c", "pre", base + jitter),
            ("c", "post", base + 10.0 + jitter),
        ]
    df = spark.createDataFrame(rows, "g string, p string, v double")
    r = diff_in_diff(df, "g", "p", "v", "t", "c", "pre", "post").collect()[0]
    assert r["did"] == 30.0
    # all four cells share the same jitter spread: var = var(i % 7).
    # A wrapped bigint Σq² turns the variance negative (se_did NULL /
    # garbage); with exact decimal sums only the documented double
    # cancellation in the n·Σq² − (Σq)² read-out remains (<1% here)
    cell = [float(i % 7) for i in range(40)]
    m = sum(cell) / len(cell)
    var = sum((x - m) ** 2 for x in cell) / (len(cell) - 1)
    se = math.sqrt(4 * var / 40)
    assert r["se_did"] is not None and abs(r["se_did"] - se) / se < 0.01
    assert r["t_did"] is not None and r["t_did"] > 0

    cu_rows = [
        (v, base + float(i % 7) + (30.0 if v == "t" else 0.0),
         base + float(i % 7))
        for v in ("c", "t")
        for i in range(40)
    ]
    cdf = spark.createDataFrame(cu_rows, "variant string, y double, x double")
    c = cuped_adjusted_effect(cdf, "variant", "y", "x", "c", "t").collect()[0]
    # y = x + variant effect exactly => theta = 1 EXACTLY (wrapped
    # bigint moments would make it garbage); the adjusted variance
    # keeps only the treatment-effect spread, so var_reduction is the
    # small covariate share var(x)/vary, not ~1
    assert c["theta"] is not None and abs(c["theta"] - 1.0) < 1e-6
    assert c["effect_raw"] == 30.0
    assert c["effect_cuped"] is not None and abs(c["effect_cuped"] - 30.0) < 1e-4
    assert c["var_reduction"] is not None and 0.0 < c["var_reduction"] < 0.05


def test_cuped_degenerate_constant_covariate(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        cuped_adjusted_effect,
    )

    rows = [("c", 1.0, 5.0), ("c", 2.0, 5.0), ("t", 3.0, 5.0), ("t", 4.0, 5.0)]
    df = spark.createDataFrame(rows, "variant string, y double, x double")
    r = cuped_adjusted_effect(df, "variant", "y", "x", "c", "t").collect()[0]
    assert r["effect_raw"] == 2.0
    assert r["theta"] is None and r["effect_cuped"] is None


def test_mann_whitney_golden_with_ties(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        mann_whitney_u,
    )

    # pooled sorted: 1a, {2a,2b}, {3a,3b}, 4b -> R_a = 1 + 2.5 + 4.5 = 8
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u_a"] == 2.0 and r["u_b"] == 7.0
    # ties: two runs of t=2 -> sum(t^3 - t) = 12
    import math

    var = 3 * 3 / 12 * ((6 + 1) - 12 / (6 * 5))
    z = (2.0 - 4.5) / math.sqrt(var)
    assert abs(r["z"] - z) < 1e-6
    # all-tied input: variance 0 -> z NULL, U = n_a n_b / 2
    tied = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0)], "g string, v double"
    )
    r = mann_whitney_u(tied, "g", "v", "a", "b").collect()[0]
    assert r["u_a"] == 1.0 and r["z"] is None


def test_anova_oneway_golden(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        anova_oneway,
    )

    rows = [("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
            ("g2", 2.0), ("g2", 3.0), ("g2", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert (r["k"], r["n"]) == (2, 6)
    assert abs(r["ss_between"] - 1.5) < 1e-6
    assert abs(r["ss_within"] - 4.0) < 1e-6
    assert abs(r["f_stat"] - 1.5) < 1e-6
    assert abs(r["eta_sq"] - 1.5 / 5.5) < 1e-6
    # one group -> F NULL
    one = spark.createDataFrame([("g1", 1.0), ("g1", 2.0)], "g string, v double")
    r = anova_oneway(one, "g", "v").collect()[0]
    assert r["f_stat"] is None


def test_isotonic_calibration_pools_violators(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        isotonic_calibration,
    )

    # 3 occupied bins with rates 0.6, 0.2, 0.7: PAV pools the first two
    rows = []
    rows += [(0.05, 1)] * 6 + [(0.05, 0)] * 4     # bin 0: rate .6
    rows += [(0.35, 1)] * 2 + [(0.35, 0)] * 8     # bin 3: rate .2
    rows += [(0.75, 1)] * 7 + [(0.75, 0)] * 3     # bin 7: rate .7
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in isotonic_calibration(df, "score", "label", 10).collect()}
    assert set(out) == {0, 3, 7}
    assert abs(out[0]["rate"] - 0.6) < 1e-6 and abs(out[0]["fit"] - 0.4) < 1e-6
    assert abs(out[3]["fit"] - 0.4) < 1e-6
    assert abs(out[7]["fit"] - 0.7) < 1e-6
    # monotone non-decreasing
    fits = [out[b]["fit"] for b in sorted(out)]
    assert fits == sorted(fits)
    # already-monotone input is untouched (fit == rate)
    mono = spark.createDataFrame(
        [(0.1, 0)] * 9 + [(0.1, 1)] + [(0.9, 1)] * 9 + [(0.9, 0)],
        "score double, label int",
    )
    out = {r["bin"]: r for r in isotonic_calibration(mono, "score", "label", 10).collect()}
    assert abs(out[1]["fit"] - 0.1) < 1e-6 and abs(out[9]["fit"] - 0.9) < 1e-6


def test_stratified_effect_golden(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        stratified_effect,
    )

    # type-1 median of x = 0..9 (each twice) is the value at rank
    # ceil(20/2) = 10, i.e. 4.0 -> low stratum {0..3}, high {4..9};
    # treatment adds +1 below the boundary and +3 at/above it
    rows = []
    for i in range(10):
        x = float(i)
        base = 10.0 if i < 4 else 20.0
        rows.append(("c", base, x))
        rows.append(("t", base + (1.0 if i < 4 else 3.0), x))
    df = spark.createDataFrame(rows, "variant string, y double, x double")
    out = sorted(
        stratified_effect(df, "variant", "y", "x", "c", "t", n_strata=2).collect(),
        key=lambda r: r["stratum"],
    )
    assert len(out) == 2
    lo, hi = out
    assert abs(lo["diff"] - 1.0) < 1e-6 and abs(hi["diff"] - 3.0) < 1e-6
    assert abs(lo["weight"] - 0.4) < 1e-6 and abs(hi["weight"] - 0.6) < 1e-6
    assert lo["n_c"] == 4 and lo["n_t"] == 4
    assert hi["n_c"] == 6 and hi["n_t"] == 6


def test_cohen_kappa_golden(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        cohen_kappa,
    )

    # classic 2x2: n=10, agree=7; marginals a: 6 hi/4 lo, b: 5 hi/5 lo
    # pe_num = 6*5 + 4*5 = 50; kappa = (10*7 - 50) / (100 - 50) = 0.4
    rows = (
        [("hi", "hi")] * 4 + [("hi", "lo")] * 2
        + [("lo", "hi")] * 1 + [("lo", "lo")] * 3
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["agree"]) == (10, 7)
    assert abs(r["po"] - 0.7) < 1e-6
    assert abs(r["pe"] - 0.5) < 1e-6
    assert abs(r["kappa"] - 0.4) < 1e-6
    # constant raters: denominator 0 -> kappa NULL
    const = spark.createDataFrame([("x", "x"), ("x", "x")], "a string, b string")
    r = cohen_kappa(const, "a", "b").collect()[0]
    assert r["kappa"] is None and r["po"] == 1.0


def test_js_divergence_golden_and_bounds(spark):
    import math

    from biomedical_data_integration_spark.operators.evaluation import (
        js_divergence,
    )

    # side A all in bin 0, side B all in bin 9: maximal JSD = ln 2
    rows = [(1.0, False)] * 5 + [(490.0, True)] * 5
    df = spark.createDataFrame(rows, "value double, is_b boolean")
    out = js_divergence(df, "value", "is_b", n_bins=10, lo=0.0, hi=500.0)
    r = out.collect()
    assert len(r) == 2
    assert all(abs(x["jsd"] - math.log(2)) < 1e-5 for x in r)
    # identical distributions -> JSD 0
    same = spark.createDataFrame(
        [(100.0, False), (100.0, True)], "value double, is_b boolean"
    )
    r0 = js_divergence(same, "value", "is_b").collect()[0]
    assert abs(r0["jsd"]) < 1e-9


def test_spearman_corr_golden(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        spearman_corr,
    )

    # perfectly monotone (nonlinear) relation -> rho = 1
    rows = [(1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 100.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = spearman_corr(df, "a", "b").collect()[0]
    assert r["n"] == 4 and abs(r["rho"] - 1.0) < 1e-6
    # reversed -> rho = -1
    rev = spark.createDataFrame(
        [(1.0, 9.0), (2.0, 4.0), (3.0, 1.0)], "a double, b double"
    )
    r = spearman_corr(rev, "a", "b").collect()[0]
    assert abs(r["rho"] + 1.0) < 1e-6
    # constant side -> NULL
    const = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0)], "a double, b double"
    )
    assert spearman_corr(const, "a", "b").collect()[0]["rho"] is None
    # ties share average ranks: a=(1,2,2,3), b=(1,2,3,4) -> rho from
    # ranks (1, 2.5, 2.5, 4) vs (1, 2, 3, 4)
    tied = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)], "a double, b double"
    )
    r = tied.transform(lambda d: spearman_corr(d, "a", "b")).collect()[0]
    import math

    ra, rb = [1, 2.5, 2.5, 4], [1, 2, 3, 4]
    n = 4
    sa, sb = sum(ra), sum(rb)
    sab = sum(x * y for x, y in zip(ra, rb))
    saa, sbb = sum(x * x for x in ra), sum(y * y for y in rb)
    rho = (n * sab - sa * sb) / math.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )
    assert abs(r["rho"] - rho) < 1e-6


def test_srm_check_golden_and_unknown_variant(spark):
    import pytest

    from biomedical_data_integration_spark.operators.evaluation import (
        srm_check,
    )

    rows = [("A",)] * 60 + [("B",)] * 40
    df = spark.createDataFrame(rows, "variant string")
    out = srm_check(df, "variant", {"A": 0.5, "B": 0.5}).collect()
    by = {r["variant"]: r for r in out}
    assert by["A"]["n_obs"] == 60 and by["A"]["n_expected"] == 50.0
    # chi2 = (60-50)^2/50 + (40-50)^2/50 = 4.0
    assert all(abs(r["chi2"] - 4.0) < 1e-6 for r in out)
    assert all(r["df"] == 1 for r in out)
    # shares must sum to 1
    with pytest.raises(ValueError):
        srm_check(df, "variant", {"A": 0.5})
    # unknown variant fails loudly at execution
    bad = spark.createDataFrame([("A",), ("C",)], "variant string")
    with pytest.raises(Exception, match="not in expected allocation"):
        srm_check(bad, "variant", {"A": 0.5, "B": 0.5}).collect()


def test_srm_check_zero_traffic_variant(spark):
    """A designed variant with NO rows must contribute its full
    (0 - n·share)²/(n·share) term — the worst sample-ratio mismatch
    (ADVICE r8): 100 rows all on 'A' with a 50/50 design -> chi2 =
    (100-50)²/50 + (0-50)²/50 = 100."""
    from biomedical_data_integration_spark.operators.evaluation import (
        srm_check,
    )

    df = spark.createDataFrame([("A",)] * 100, "variant string")
    out = srm_check(df, "variant", {"A": 0.5, "B": 0.5}).collect()
    by = {r["variant"]: r for r in out}
    assert set(by) == {"A", "B"}
    assert by["B"]["n_obs"] == 0 and by["B"]["n_expected"] == 50.0
    assert all(abs(r["chi2"] - 100.0) < 1e-6 for r in out)


def test_apply_isotonic_clamps_out_of_range_scores(spark):
    """Scores outside [0, 1] clamp to the edge bins (ADVICE r8): a
    negative score must serve the LOWEST fitted value, not throw on
    element_at(lut, 0) or silently index from the END of the LUT."""
    from biomedical_data_integration_spark.operators.evaluation import (
        apply_isotonic,
        isotonic_calibration,
    )

    rows = (
        [(0.05, 0)] * 8 + [(0.05, 1)] * 2
        + [(0.95, 1)] * 9 + [(0.95, 0)]
    )
    df = spark.createDataFrame(rows, "score double, label int")
    fit = isotonic_calibration(df, "score", "label", n_bins=10).collect()
    probe = spark.createDataFrame(
        [(-0.5,), (-0.05,), (0.0,), (1.0,), (2.5,)], "score double"
    )
    got = {
        r["score"]: r["calibrated"]
        for r in apply_isotonic(probe, fit, "score", n_bins=10).collect()
    }
    assert abs(got[-0.5] - 0.2) < 1e-6
    assert abs(got[-0.05] - 0.2) < 1e-6
    assert abs(got[0.0] - 0.2) < 1e-6
    assert abs(got[1.0] - 0.9) < 1e-6
    assert abs(got[2.5] - 0.9) < 1e-6


def test_new_stats_operators_empty_input(spark):
    """Empty inputs produce well-defined degenerate readouts (no NaNs,
    no exceptions) across the round-7 statistics family."""
    from biomedical_data_integration_spark.operators.evaluation import (
        anova_oneway,
        cohen_kappa,
        js_divergence,
        mann_whitney_u,
        spearman_corr,
    )

    empty_gv = spark.createDataFrame([], "g string, v double")
    r = anova_oneway(empty_gv, "g", "v").collect()[0]
    assert (r["k"], r["n"]) == (0, 0) and r["f_stat"] is None

    r = mann_whitney_u(empty_gv, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (0, 0) and r["z"] is None

    empty_ab = spark.createDataFrame([], "a double, b double")
    r = spearman_corr(empty_ab, "a", "b").collect()[0]
    assert r["n"] == 0 and r["rho"] is None

    empty_rr = spark.createDataFrame([], "a string, b string")
    r = cohen_kappa(empty_rr, "a", "b").collect()[0]
    assert (r["n"], r["agree"]) == (0, 0)
    assert r["po"] is None and r["kappa"] is None

    empty_vs = spark.createDataFrame([], "value double, is_b boolean")
    assert js_divergence(empty_vs, "value", "is_b").count() == 0


def test_apply_isotonic_serves_fit(spark):
    from biomedical_data_integration_spark.operators.evaluation import (
        apply_isotonic,
        isotonic_calibration,
    )

    rows = []
    # bins 0/10/19 occupied with rates 0.2, 0.5, 0.9 (already monotone)
    for sc, y, cnt in [(0.01, 1, 2), (0.01, 0, 8),
                       (0.52, 1, 5), (0.52, 0, 5),
                       (0.99, 1, 9), (0.99, 0, 1)]:
        rows += [(sc, y)] * cnt
    df = spark.createDataFrame(rows, "score double, label int")
    fit = isotonic_calibration(df, "score", "label", n_bins=20).collect()
    served = apply_isotonic(df, fit, "score", n_bins=20)
    got = {r["score"]: r["calibrated"] for r in served.distinct().collect()}
    assert abs(got[0.01] - 0.2) < 1e-6
    assert abs(got[0.52] - 0.5) < 1e-6
    assert abs(got[0.99] - 0.9) < 1e-6
    # unseen bin between fitted bins -> nearest LOWER fitted value
    probe = spark.createDataFrame([(0.30,), (0.75,)], "score double")
    got2 = {r["score"]: r["calibrated"]
            for r in apply_isotonic(probe, fit, "score", n_bins=20).collect()}
    assert abs(got2[0.30] - 0.2) < 1e-6
    assert abs(got2[0.75] - 0.5) < 1e-6


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=499),
            st.booleans(),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_js_divergence_bounded_property(spark, vals):
    """0 <= JSD <= ln 2 for any input split."""
    import math

    from biomedical_data_integration_spark.operators.evaluation import (
        js_divergence,
    )

    rows = [(float(v), b) for v, b in vals]
    df = spark.createDataFrame(rows, "value double, is_b boolean")
    out = js_divergence(df, "value", "is_b", n_bins=5, lo=0.0, hi=500.0)
    for r in out.collect():
        if r["jsd"] is None:  # one-sided input: undefined by contract
            assert all(x["jsd"] is None for x in out.collect())
        else:
            assert -1e-9 <= r["jsd"] <= math.log(2) + 1e-6


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["x", "y", "z"]),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_cohen_kappa_range_property(spark, vals):
    """kappa <= 1 always, = 1 iff perfect agreement with >1 category."""
    from biomedical_data_integration_spark.operators.evaluation import (
        cohen_kappa,
    )

    df = spark.createDataFrame(list(vals), "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    if r["kappa"] is not None:
        assert r["kappa"] <= 1.0 + 1e-9
        if r["agree"] == r["n"]:
            assert abs(r["kappa"] - 1.0) < 1e-6


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=30,
    )
)
def test_spearman_range_and_monotone_invariance(spark, vals):
    """|rho| <= 1, and rho is invariant under a strictly monotone
    transform of either side (the defining property of a rank statistic)."""
    from biomedical_data_integration_spark.operators.evaluation import (
        spearman_corr,
    )

    rows = [(float(a), float(b)) for a, b in vals]
    df = spark.createDataFrame(rows, "a double, b double")
    r = spearman_corr(df, "a", "b").collect()[0]
    if r["rho"] is not None:
        assert abs(r["rho"]) <= 1.0 + 1e-9
    # strictly monotone transform: x -> 3x + 7 (rank-preserving, and
    # scale=6 quantization keeps distinct integers distinct)
    df2 = spark.createDataFrame(
        [(3.0 * a + 7.0, b) for a, b in rows], "a double, b double"
    )
    r2 = spearman_corr(df2, "a", "b").collect()[0]
    assert r2["rho"] == r["rho"]


def test_mann_whitney_single_row_input(spark):
    """n = 1 pooled row must yield NULL z, not an ANSI divide-by-zero
    (the tie term divides by n(n-1))."""
    from biomedical_data_integration_spark.operators.evaluation import (
        mann_whitney_u,
    )

    one = spark.createDataFrame([("a", 5.0)], "g string, v double")
    r = mann_whitney_u(one, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (1, 0)
    assert r["u_a"] is None and r["z"] is None
