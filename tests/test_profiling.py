"""Table profiling and schema-drift operators."""

from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.profiling import (
    detect_schema_drift,
    profile_table,
)


def test_profile_table_counts_nulls_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (2, None, None)],
        "id int, s string, allnull string",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["id"]["n_rows"] == 3 and rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 2
    assert (rows["id"]["min_value"], rows["id"]["max_value"]) == ("1", "2")
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    # all-null columns keep a row with zero distincts and null min/max
    assert rows["allnull"]["n_nulls"] == 3
    assert rows["allnull"]["n_distinct"] == 0
    assert rows["allnull"]["min_value"] is None
    assert rows["allnull"]["dtype"] == "string"


def test_profile_table_approx_distinct_same_shape(spark):
    df = spark.createDataFrame([(i % 10, str(i % 5)) for i in range(1000)],
                               "a int, b string")
    exact = {r["column"]: r["n_distinct"]
             for r in profile_table(df).collect()}
    approx = {r["column"]: r["n_distinct"]
              for r in profile_table(df, exact_distinct=False).collect()}
    assert exact == {"a": 10, "b": 5}
    for c in exact:  # approx within HLL tolerance at tiny cardinality
        assert abs(approx[c] - exact[c]) <= 1


def test_detect_schema_drift_statuses(spark):
    old = spark.createDataFrame(
        [(1, "x", "A", 0.5)], "id int, gone string, dom string, price double"
    )
    new = spark.createDataFrame(
        [(1.0, "y", "A")], "id double, fresh string, dom string"
    )
    rows = {r["column"]: r for r in detect_schema_drift(old, new).collect()}
    assert rows["gone"]["status"] == "removed"
    assert rows["price"]["status"] == "removed"
    assert rows["fresh"]["status"] == "added"
    assert rows["id"]["status"] == "type_changed"
    assert rows["dom"]["status"] == "stable"          # identical domains
    assert rows["dom"]["domain_jaccard"] == 1.0

    drifted = new.withColumn("dom", F.lit("Z"))
    rows2 = {r["column"]: r for r in detect_schema_drift(old, drifted).collect()}
    assert rows2["dom"]["status"] == "domain_drift"
    assert rows2["dom"]["domain_jaccard"] == 0.0


def test_validate_table_rules(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        validate_table,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),
            (2, None, 3.0),
            (4, "zz", 1000.0),
        ],
        "id bigint, cat string, amount double",
    )
    rules = [
        {"name": "id_unique", "type": "unique", "column": "id"},
        {"name": "cat_not_null", "type": "not_null", "column": "cat"},
        {"name": "cat_known", "type": "in_set", "column": "cat",
         "values": ["a", "b"]},
        {"name": "amount_range", "type": "range", "column": "amount",
         "min": 0, "max": 100},
        {"name": "id_positive", "type": "expression", "expr": "id > 0"},
    ]
    out = {r["rule"]: (r["violations"], r["passed"])
           for r in validate_table(df, rules).collect()}
    assert out["id_unique"] == (1, False)      # id 2 appears twice
    assert out["cat_not_null"] == (1, False)
    assert out["cat_known"] == (1, False)      # 'zz' (null not counted)
    assert out["amount_range"] == (2, False)   # -5 and 1000
    assert out["id_positive"] == (0, True)


def test_validate_table_one_aggregation_pass(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        validate_table,
    )

    df = spark.createDataFrame([(1, 2.0)], "id bigint, v double")
    out = validate_table(df, [
        {"name": "r1", "type": "not_null", "column": "id"},
        {"name": "r2", "type": "range", "column": "v", "min": 0},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1


def test_validate_table_rejects_bad_rules(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.profiling import (
        validate_table,
    )

    df = spark.createDataFrame([(1,)], "id bigint")
    with _pytest.raises(ValueError, match="non-empty"):
        validate_table(df, [])
    with _pytest.raises(ValueError, match="unknown rule type"):
        validate_table(df, [{"name": "x", "type": "nope"}])
    with _pytest.raises(ValueError, match="duplicate"):
        validate_table(df, [
            {"name": "x", "type": "not_null", "column": "id"},
            {"name": "x", "type": "not_null", "column": "id"},
        ])


def test_validate_table_rejects_non_identifier_names(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.profiling import (
        validate_table,
    )

    df = spark.createDataFrame([(1,)], "id bigint")
    with _pytest.raises(ValueError, match="must match"):
        validate_table(df, [{"name": "can't", "type": "not_null",
                             "column": "id"}])


def test_winsorize_clips_tails_per_group(spark):
    from biomedical_data_integration_spark.operators.profiling import winsorize

    rows = [(i, "a", float(i)) for i in range(101)]  # 0..100
    rows += [(200 + i, "b", 50.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    out = winsorize(df, "v", group_col="grp", lower=0.05, upper=0.95)
    a = [r for r in out.collect() if r["grp"] == "a"]
    vals = sorted(r["v_winsorized"] for r in a)
    assert vals[0] == 5.0 and vals[-1] == 95.0  # tails clipped to p5/p95
    mid = [r["v_winsorized"] for r in a if 10 <= r["v"] <= 90]
    assert all(r == v for r, v in zip(mid, mid))  # interior untouched
    b = {r["v_winsorized"] for r in out.collect() if r["grp"] == "b"}
    assert b == {50.0}  # constant group unchanged


def test_winsorize_validates_bounds(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.profiling import winsorize

    df = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    with _pytest.raises(ValueError, match="lower"):
        winsorize(df, "v", lower=0.9, upper=0.1)


def test_winsorize_null_group_rows_kept(spark):
    from biomedical_data_integration_spark.operators.profiling import winsorize

    rows = [(i, "a", float(i)) for i in range(10)]
    rows += [(100 + i, None, float(1000 + i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    out = winsorize(df, "v", group_col="grp", lower=0.0, upper=0.5)
    # an operator documented as APPENDING a column must not lose rows —
    # the null group clips against its own bounds (median 1004.5 here)
    assert out.count() == 20
    nulls = {r["v_winsorized"] for r in out.collect() if r["grp"] is None}
    assert max(nulls) == 1004.5


def test_discretize_width_and_frequency(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        discretize,
    )

    # skewed: 9 small values + one huge outlier
    rows = [(i, float(i)) for i in range(9)] + [(9, 1000.0), (10, None)]
    df = spark.createDataFrame(rows, "id bigint, v double")

    width = {r["id"]: r["v_bin"] for r in discretize(df, "v", 4).collect()}
    # outlier alone in the top bin; all small values crammed into bin 0
    assert width[9] == 3
    assert all(width[i] == 0 for i in range(9))
    assert width[10] is None

    freq = {
        r["id"]: r["v_bin"]
        for r in discretize(df, "v", 4, method="frequency").collect()
    }
    # equal-mass bins spread the small values across bins
    assert len({freq[i] for i in range(9)}) >= 3
    assert freq[9] == 3 and freq[10] is None


def test_discretize_constant_column_and_errors(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.profiling import (
        discretize,
    )

    df = spark.createDataFrame([(1, 7.0), (2, 7.0)], "id bigint, v double")
    out = {r["id"]: r["v_bin"] for r in discretize(df, "v", 5).collect()}
    assert out == {1: 0, 2: 0}
    with _pytest.raises(ValueError, match="method"):
        discretize(df, "v", 5, method="kmeans")
    with _pytest.raises(ValueError, match="n_bins"):
        discretize(df, "v", 1)


def test_corpus_report_metrics(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        corpus_report,
    )

    df = spark.createDataFrame(
        [(0, "hello world", "en"), (1, "hello world", "en"),
         (2, "bonjour le monde entier", "fr")],
        "doc_id bigint, text string, lang string",
    )
    got = {r["metric"]: r["value"]
           for r in corpus_report(df, lang_col="lang").collect()}
    assert got["n_docs"] == 3.0
    assert got["n_tokens_ws"] == 8.0
    # one exact duplicate pair -> 2 distinct texts of 3
    assert abs(got["exact_dup_rate"] - (1 - 2 / 3)) < 1e-6
    assert got["n_languages"] == 2.0
    assert abs(got["top_lang_share"] - 2 / 3) < 1e-6
    assert 0.0 <= got["avg_quality_score"] <= 1.0
    # without lang_col the language rows are absent
    no_lang = {r["metric"] for r in corpus_report(df).collect()}
    assert "top_lang_share" not in no_lang and len(no_lang) == 6


def test_robust_zscore_resists_outliers(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        robust_zscore,
    )

    # 9 values around 10 plus one huge outlier: median=10, MAD=1
    rows = [(i, 10.0 + (i % 3) - 1) for i in range(9)] + [(9, 1000.0)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out = {r["id"]: r["v_rz"] for r in robust_zscore(df, "v").collect()}
    # the outlier scores huge; in-mass values stay near 0 — the mean/std
    # z-score would have dragged the center toward the outlier
    assert out[9] > 100
    assert all(abs(out[i]) <= 0.6745 for i in range(9))


def test_robust_zscore_grouped_and_null_group(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        robust_zscore,
    )

    rows = [
        (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 100.0),
        (5, None, 5.0), (6, None, 6.0), (7, None, 7.0),
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    out = {r["id"]: r["v_rz"]
           for r in robust_zscore(df, "v", group_col="g").collect()}
    assert len(out) == 7          # null-group rows are NOT dropped
    assert out[4] > out[3] > 0    # outlier scores highest within group a
    assert out[6] == 0.0          # null group's own median


def test_robust_zscore_zero_mad_yields_null(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        robust_zscore,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 9.0)], "id bigint, v double"
    )
    out = {r["id"]: r["v_rz"] for r in robust_zscore(df, "v").collect()}
    assert all(v is None for v in out.values())


# ---------------------------------------------------------------------------
# round-5 wave-5 statistics: correlation matrix, MI, Benford, ACF, changepoint
# ---------------------------------------------------------------------------


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from biomedical_data_integration_spark.operators.profiling import (
        correlation_matrix,
    )

    rng = np.random.RandomState(7)
    x = rng.uniform(0, 100, 200)
    y = 3.0 * x + rng.uniform(0, 40, 200)  # strongly correlated
    z = rng.uniform(0, 100, 200)  # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    out = {
        (r["col_x"], r["col_y"]): r
        for r in correlation_matrix(df, ["x", "y", "z"], scale=4).collect()
    }
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    # numpy reference on the SAME quantization
    q = lambda v: np.floor(v * 1e4 + 0.5)  # noqa: E731
    ref = np.corrcoef(q(x), q(y))[0, 1]
    assert abs(out[("x", "y")]["corr"] - ref) < 1e-5
    assert out[("x", "y")]["n"] == 200
    assert out[("x", "y")]["corr"] > 0.9
    assert abs(out[("x", "z")]["corr"]) < 0.2


def test_correlation_matrix_nulls_and_constant(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        correlation_matrix,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, None, 5.0), (4.0, 8.0, 5.0)],
        "x double, y double, c double",
    )
    out = {
        (r["col_x"], r["col_y"]): r
        for r in correlation_matrix(df, ["x", "y", "c"]).collect()
    }
    # complete-case: the null row drops everywhere
    assert out[("x", "y")]["n"] == 3
    assert abs(out[("x", "y")]["corr"] - 1.0) < 1e-6
    # zero-variance column yields NULL corr, not NaN/div-by-zero
    assert out[("x", "c")]["corr"] is None


def test_mutual_information_independent_and_identical(spark):
    import math

    from biomedical_data_integration_spark.operators.profiling import (
        mutual_information,
    )

    # perfectly dependent: b == a -> MI == H(a), NMI == 1
    rows = [(c, c) for c in "aabbccdd"]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert abs(r["mi"] - r["h_a"]) < 1e-6
    assert abs(r["nmi"] - 1.0) < 1e-6
    assert abs(r["h_a"] - math.log(4)) < 1e-5  # uniform over 4 symbols
    # independent uniform 2x2 grid -> MI == 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert abs(r["mi"]) < 1e-6
    assert abs(r["h_ab"] - (r["h_a"] + r["h_b"])) < 1e-6


def test_benford_audit_digits_and_chi2(spark):
    import math

    from biomedical_data_integration_spark.operators.profiling import (
        benford_audit,
    )

    # exact Benford multiset: digit d appears round(1000*log10(1+1/d)) times
    rows = []
    for d in range(1, 10):
        rows += [(float(d) * 10.0,)] * int(round(1000 * math.log10(1 + 1 / d)))
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert sum(r["chi2_term"] for r in out.values()) < 0.1
    # values < 1 and nulls are ignored; missing digits keep a zero row
    df = spark.createDataFrame(
        [(0.5,), (None,), (19.0,), (123.0,)], "v double"
    )
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert out[1]["n"] == 2 and out[2]["n"] == 0
    assert abs(out[1]["share"] - 1.0) < 1e-6


def test_autocorrelation_alternating_series(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        autocorrelation,
    )

    # +1,-1,+1,... : lag-1 acf = -1, lag-2 acf = +1
    rows = [(i, 1.0 if i % 2 == 0 else -1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "t int, v double")
    out = {r["lag"]: r for r in autocorrelation(df, "v", "t", 2).collect()}
    assert abs(out[1]["acf"] + 1.0) < 1e-6
    assert abs(out[2]["acf"] - 1.0) < 1e-6
    assert out[1]["n"] == 39 and out[2]["n"] == 38


def test_autocorrelation_matches_numpy_paired(spark):
    import numpy as np

    from biomedical_data_integration_spark.operators.profiling import (
        autocorrelation,
    )

    rng = np.random.RandomState(3)
    v = np.cumsum(rng.uniform(-1, 1, 60))  # random walk: high lag-1 acf
    df = spark.createDataFrame(
        [("g", i, float(x)) for i, x in enumerate(v)],
        "g string, t int, v double",
    )
    out = {
        r["lag"]: r["acf"]
        for r in autocorrelation(df, "v", "t", 3, group_col="g", scale=6).collect()
    }
    for k in (1, 2, 3):
        q = np.floor(v * 1e6 + 0.5)
        ref = np.corrcoef(q[k:], q[:-k])[0, 1]
        assert abs(out[k] - ref) < 1e-5


def test_mean_shift_changepoint_finds_step(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        mean_shift_changepoint,
    )

    rows = [("a", i, 10.0 if i < 20 else 30.0) for i in range(40)]
    rows += [("b", i, 5.0) for i in range(40)]  # flat series: stat ~ 0
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = {
        r["g"]: r
        for r in mean_shift_changepoint(df, "v", "t", group_col="g").collect()
    }
    assert out["a"]["split_after"] == 19
    assert abs(out["a"]["mean_left"] - 10.0) < 1e-6
    assert abs(out["a"]["mean_right"] - 30.0) < 1e-6
    assert abs(out["a"]["shift"] - 20.0) < 1e-6
    # flat series: zero statistic everywhere, earliest split wins ties
    assert out["b"]["stat"] == 0.0 and out["b"]["split_after"] == 2
    # min_seg respected: series shorter than 2*min_seg emit nothing
    tiny = spark.createDataFrame([("c", 1, 1.0), ("c", 2, 9.0)], "g string, t int, v double")
    assert mean_shift_changepoint(tiny, "v", "t", group_col="g").count() == 0


def test_pareto_frontier_golden(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        pareto_frontier,
    )

    # minimize x, maximize y; (3,5) dominated by (2,5); (2,3) by (2,5);
    # duplicates of a frontier point survive the distinct exactly once
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 5.0), (2.0, 5.0), (3.0, 5.0), (2.0, 3.0), (4.0, 9.0)],
        "x double, y double",
    )
    out = sorted(
        (r["x"], r["y"]) for r in pareto_frontier(df, "x", "y").collect()
    )
    assert out == [(1.0, 2.0), (2.0, 5.0), (4.0, 9.0)]


def test_pareto_frontier_matches_naive(spark):
    import numpy as np

    from biomedical_data_integration_spark.operators.profiling import (
        pareto_frontier,
    )

    rng = np.random.RandomState(11)
    pts = [(float(x), float(y)) for x, y in rng.randint(0, 30, (200, 2))]
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted(
        (r["x"], r["y"]) for r in pareto_frontier(df, "x", "y").collect()
    )
    uniq = set(pts)
    naive = sorted(
        p
        for p in uniq
        if not any(
            q != p and q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in uniq
        )
    )
    assert got == naive


def test_feature_hash_deterministic_and_bounded(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        feature_hash,
    )

    df = spark.createDataFrame(
        [("hi", "x"), ("lo", None), ("hi", "x")], "a string, b string"
    )
    out = feature_hash(df, ["a", "b"], n_buckets=32).collect()
    # one entry per column, stable across identical rows, bounded index
    assert all(len(r["features"]) == 2 for r in out)
    assert out[0]["features"] == out[2]["features"]
    for r in out:
        for e in r["features"]:
            assert 0 <= e["index"] < 32 and e["sign"] in (-1, 1)
    # nulls hash to a real bucket (constant width), distinct from "x"
    assert out[1]["features"][1] != out[0]["features"][1]


def test_cross_correlation_golden_vs_numpy(spark):
    import numpy as np
    from biomedical_data_integration_spark.operators.profiling import (
        cross_correlation,
    )

    # b is a copied one day after a: perfect correlation at lag +1
    days = [f"2024-01-{d:02d}" for d in range(1, 11)]
    vals = [3.0, 7.0, 2.0, 9.0, 5.0, 8.0, 1.0, 6.0, 4.0, 10.0]
    rows = [(f"{d} 12:00:00", "a", v) for d, v in zip(days, vals)]
    rows += [
        (f"{days[i + 1]} 12:00:00", "b", vals[i]) for i in range(len(days) - 1)
    ]
    df = spark.createDataFrame(rows, "ts string, k string, v double").select(
        F.to_timestamp("ts").alias("ts"), "k", "v"
    )
    out = {
        r["lag"]: r
        for r in cross_correlation(df, "v", "ts", "k", "a", "b", 2).collect()
    }
    assert out[1]["ccf"] == 1.0 and out[1]["n"] == 9
    # numpy cross-check at lag 0: pairs (a_t, b_t) on days 2..10
    a = np.array(vals[1:])
    b = np.array(vals[:-1])
    ref = np.corrcoef(a, b)[0, 1]
    assert abs(out[0]["ccf"] - ref) < 1e-5
    assert out[0]["n"] == 9


def test_cross_correlation_degenerate_constant_series(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        cross_correlation,
    )

    rows = [(f"2024-01-{d:02d} 00:00:00", k, 5.0) for d in range(1, 6)
            for k in ("a", "b")]
    df = spark.createDataFrame(rows, "ts string, k string, v double").select(
        F.to_timestamp("ts").alias("ts"), "k", "v"
    )
    out = cross_correlation(df, "v", "ts", "k", "a", "b", 1).collect()
    assert all(r["ccf"] is None for r in out)  # zero variance


def test_categorical_entropy_golden(spark):
    import math
    from biomedical_data_integration_spark.operators.profiling import (
        categorical_entropy,
    )

    rows = (
        [("u1", "x")] * 4
        + [("u1", "y")] * 4
        + [("u2", "x")] * 7
        + [("u2", "y")] * 1
        + [("u3", "x")] * 3
    )
    df = spark.createDataFrame(rows, "u string, c string")
    out = {r["u"]: r for r in categorical_entropy(df, "u", "c").collect()}
    assert abs(out["u1"]["entropy"] - math.log(2)) < 1e-6
    assert out["u1"]["norm_entropy"] == 1.0
    h2 = math.log(8) - (7 * math.log(7)) / 8
    assert abs(out["u2"]["entropy"] - h2) < 1e-5
    assert out["u3"]["entropy"] == 0.0 and out["u3"]["norm_entropy"] is None
    assert out["u3"]["k"] == 1 and out["u3"]["n"] == 3


def test_theil_sen_trend_golden_vs_scipy_formulas(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        theil_sen_trend,
    )

    # clean +2/day line with one wild outlier: OLS would bend, Theil-Sen
    # must not
    rows = []
    for i, d in enumerate(range(1, 11)):
        val = 10.0 + 2.0 * i
        if i == 5:
            val = 500.0
        rows.append((f"2024-01-{d:02d} 03:00:00", val))
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )
    r = theil_sen_trend(df, "v", "ts").collect()[0]
    assert r["n_days"] == 10 and r["n_pairs"] == 45
    assert abs(r["slope_per_day"] - 2.0) < 1e-6
    # S: the outlier flips sign for pairs crossing it; with one spike
    # at i=5: pairs (j<5, 5) are +1, (5, j>5) are -1 -> S stays high
    assert r["s_statistic"] > 30
    assert r["z_mk"] is not None and r["z_mk"] > 3.0


def test_theil_sen_trend_ties_and_groups(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        theil_sen_trend,
    )

    rows = [("g1", f"2024-01-{d:02d}", 5.0) for d in range(1, 6)]
    rows += [("g2", f"2024-01-{d:02d}", float(d)) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, ts string, v double")
    out = {r["g"]: r for r in theil_sen_trend(df, "v", "ts", "g").collect()}
    # all-tied series: S = 0, var fully tie-corrected to 0 -> z NULL
    r = out["g1"]
    assert r["s_statistic"] == 0 and r["slope_per_day"] == 0.0
    assert r["z_mk"] is None
    # strictly increasing: S = n_pairs, slope exactly 1
    r = out["g2"]
    assert r["s_statistic"] == 10 and r["n_pairs"] == 10
    assert r["slope_per_day"] == 1.0
    # z = (S-1)/sqrt(n(n-1)(2n+5)/18) with no ties
    import math

    var = 5 * 4 * 15 / 18
    assert abs(r["z_mk"] - (10 - 1) / math.sqrt(var)) < 1e-5


def test_theil_sen_daily_presum_before_pairs(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        theil_sen_trend,
    )

    # two rows on day 1 sum to 4.0 -> slope (6-4)/1 = 2
    rows = [("2024-01-01 01:00:00", 1.0), ("2024-01-01 09:00:00", 3.0),
            ("2024-01-02 01:00:00", 6.0)]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )
    r = theil_sen_trend(df, "v", "ts").collect()[0]
    assert r["n_days"] == 2 and r["n_pairs"] == 1
    assert abs(r["slope_per_day"] - 2.0) < 1e-6


def test_gini_coefficient_golden(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        gini_coefficient,
    )

    # perfectly even -> 0; one-holder -> (n-1)/n
    rows = [("even", 5.0)] * 4 + [("one", 0.0)] * 3 + [("one", 12.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in gini_coefficient(df, "v", "g").collect()}
    assert out["even"]["gini"] == 0.0
    assert abs(out["one"]["gini"] - 0.75) < 1e-6
    assert out["even"]["total"] == 20.0 and out["one"]["n"] == 4
    # hand case: [1,2,3,4] -> G = (2*(1+4+9+16) - 5*10) / (4*10) = 0.25
    df2 = spark.createDataFrame(
        [(float(x),) for x in (3, 1, 4, 2)], "v double"
    )
    r = gini_coefficient(df2, "v").collect()[0]
    assert abs(r["gini"] - 0.25) < 1e-6


def test_gini_coefficient_negative_values_yield_null(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        gini_coefficient,
    )

    df = spark.createDataFrame([(1.0,), (-2.0,), (3.0,)], "v double")
    r = gini_coefficient(df, "v").collect()[0]
    assert r["gini"] is None


def test_rolling_correlation_golden_vs_numpy(spark):
    import numpy as np
    from biomedical_data_integration_spark.operators.profiling import (
        rolling_correlation,
    )

    a = [3.0, 7.0, 2.0, 9.0, 5.0, 8.0, 1.0, 6.0]
    b = [4.0, 6.0, 3.0, 8.0, 6.0, 7.0, 2.0, 5.0]
    rows = []
    for i, (x, y) in enumerate(zip(a, b)):
        d = f"2024-01-{i + 1:02d} 12:00:00"
        rows += [(d, "p", x), (d, "q", y)]
    df = spark.createDataFrame(rows, "ts string, k string, v double").select(
        F.to_timestamp("ts").alias("ts"), "k", "v"
    )
    out = {
        str(r["day"]): r
        for r in rolling_correlation(
            df, "v", "ts", "k", "p", "q", window_days=4, min_periods=3
        ).collect()
    }
    # day 2: only 2 periods in frame -> NULL
    assert out["2024-01-02"]["corr"] is None and out["2024-01-02"]["n"] == 2
    # day 4: full 4-day frame, numpy parity
    ref = np.corrcoef(a[:4], b[:4])[0, 1]
    assert abs(out["2024-01-04"]["corr"] - ref) < 1e-5
    # day 8: trailing frame days 5..8
    ref8 = np.corrcoef(a[4:8], b[4:8])[0, 1]
    assert abs(out["2024-01-08"]["corr"] - ref8) < 1e-5


def test_rolling_correlation_unpaired_days_drop(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        rolling_correlation,
    )

    # day 2 has only series p -> no pair row; frame counts skip it
    rows = [
        ("2024-01-01 00:00:00", "p", 1.0), ("2024-01-01 00:00:00", "q", 2.0),
        ("2024-01-02 00:00:00", "p", 9.0),
        ("2024-01-03 00:00:00", "p", 3.0), ("2024-01-03 00:00:00", "q", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts string, k string, v double").select(
        F.to_timestamp("ts").alias("ts"), "k", "v"
    )
    out = rolling_correlation(
        df, "v", "ts", "k", "p", "q", window_days=5, min_periods=2
    ).collect()
    assert len(out) == 2  # day 2 emits nothing
    assert {r["n"] for r in out} == {1, 2}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=500), min_size=2, max_size=12
    ),
    k=st.integers(min_value=2, max_value=5),
)
def test_gini_bounds_and_scale_invariance(spark, cents, k):
    """Gini lies in [0, 1) and is invariant under positive scaling."""
    from biomedical_data_integration_spark.operators.profiling import (
        gini_coefficient,
    )

    if sum(cents) == 0:
        return
    df = spark.createDataFrame([(c / 100.0,) for c in cents], "v double")
    g1 = gini_coefficient(df, "v").collect()[0]["gini"]
    df2 = spark.createDataFrame([(c * k / 100.0,) for c in cents], "v double")
    g2 = gini_coefficient(df2, "v").collect()[0]["gini"]
    assert 0.0 <= g1 < 1.0
    assert abs(g1 - g2) < 1e-6


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_threshold_sweep_conservation_and_monotonicity(spark, data):
    """For every threshold tp+fn and fp+tn conserve the class totals,
    and tp is non-increasing as the threshold rises."""
    from biomedical_data_integration_spark.operators.evaluation import (
        threshold_sweep,
    )

    rows = [(s / 1000.0, int(y)) for s, y in data]
    df = spark.createDataFrame(rows, "score double, label int")
    pos = sum(y for _, y in rows)
    neg = len(rows) - pos
    out = sorted(
        threshold_sweep(df, "score", "label", [0.2, 0.5, 0.8]).collect(),
        key=lambda r: r["threshold"],
    )
    tps = []
    for r in out:
        assert r["tp"] + r["fn"] == pos
        assert r["fp"] + r["tn"] == neg
        tps.append(r["tp"])
    assert tps == sorted(tps, reverse=True)


def test_kaplan_meier_golden(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        kaplan_meier,
    )

    # classic hand example: censoring at t=2 and t=4
    rows = [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(out) == {1, 2, 3}  # censor-only times emit no row
    assert (out[1]["n_risk"], out[1]["d_events"]) == (5, 1)
    assert abs(out[1]["survival"] - 0.8) < 1e-6
    assert (out[2]["n_risk"], out[2]["d_events"]) == (4, 1)
    assert abs(out[2]["survival"] - 0.6) < 1e-6
    assert (out[3]["n_risk"], out[3]["d_events"]) == (2, 1)
    assert abs(out[3]["survival"] - 0.3) < 1e-6


def test_kaplan_meier_no_censoring_matches_ecdf(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        kaplan_meier,
    )

    # without censoring KM reduces to 1 - ECDF
    durs = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame([(d, 1) for d in durs], "dur int, ev int")
    out = {r["t"]: r["survival"] for r in kaplan_meier(df, "dur", "ev").collect()}
    n = len(durs)
    for t in set(durs):
        expect = sum(1 for d in durs if d > t) / n
        assert abs(out[t] - expect) < 1e-6


def test_kaplan_meier_grouped_and_absorbing_zero(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        kaplan_meier,
    )

    rows = [("a", 1, 1), ("a", 1, 1), ("b", 2, 1), ("b", 3, 0)]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    out = {
        (r["g"], r["t"]): r["survival"]
        for r in kaplan_meier(df, "dur", "ev", "g").collect()
    }
    # group a: both die at t=1 -> survival hits exactly 0
    assert out[("a", 1)] == 0.0
    assert abs(out[("b", 2)] - 0.5) < 1e-6


def test_corpus_report_empty_corpus(spark):
    """Empty corpus: NULL rates, zero counts — not an ANSI
    divide-by-zero (found by the round-7 empty-input sweep)."""
    from biomedical_data_integration_spark.operators.profiling import (
        corpus_report,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    rows = {r["metric"]: r["value"] for r in corpus_report(empty).collect()}
    assert rows["n_docs"] == 0.0
    assert rows["exact_dup_rate"] is None
