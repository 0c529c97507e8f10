"""functions/prefix.py: the bucketed two-pass distributed prefix sum
must be BIT-EQUAL to the single-task ordered window it replaces, at any
bucketing, including the degenerate ones (0 boundaries, more buckets
than rows, NaN keys)."""

import math

import pyspark.sql.functions as F
from pyspark.sql import Window

from biomedical_data_integration_spark.functions.prefix import (
    exclusive_prefix_sums,
)


def _naive(spark_df, order_col, sum_cols):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return spark_df.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w), F.lit(0)).alias(f"{c}_xps")
            for c in sum_cols
        ],
    )


def _rows(df, keys):
    return sorted(tuple(r[k] for k in keys) for r in df.collect())


def test_matches_naive_window_exactly(spark):
    # 1000 distinct bigint keys, skewed counts
    df = spark.createDataFrame(
        [(i * 7 % 1000, (i % 13) + 1, (i % 5) + 1) for i in range(1000)],
        "v bigint, c1 bigint, c2 bigint",
    )
    keys = ["v", "c1_xps", "c2_xps"]
    for buckets in (1, 2, 7, 64, 2048):  # incl. more buckets than rows
        got = exclusive_prefix_sums(df, "v", ["c1", "c2"], buckets=buckets)
        assert _rows(got, keys) == _rows(_naive(df, "v", ["c1", "c2"]), keys)


def test_with_totals_and_double_keys(spark):
    df = spark.createDataFrame(
        [(float(i) / 3.0, i + 1) for i in range(257)], "v double, c bigint"
    )
    got = exclusive_prefix_sums(df, "v", ["c"], buckets=16, with_totals=True)
    want_tot = sum(range(1, 258))
    rows = got.collect()
    assert all(r["c_tot"] == want_tot for r in rows)
    assert _rows(got, ["v", "c_xps"]) == _rows(_naive(df, "v", ["c"]),
                                               ["v", "c_xps"])


def test_nan_sorts_last(spark):
    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (float("nan"), 5)], "v double, c bigint"
    )
    got = {
        (None if math.isnan(r["v"]) else r["v"]): r["c_xps"]
        for r in exclusive_prefix_sums(df, "v", ["c"], buckets=4).collect()
    }
    # NaN is the LAST key (Spark ordering): its prefix covers 10 + 20
    assert got == {1.0: 0, 2.0: 10, None: 30}


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "v bigint, c bigint")
    assert exclusive_prefix_sums(empty, "v", ["c"]).count() == 0
    one = spark.createDataFrame([(5, 3)], "v bigint, c bigint")
    got = exclusive_prefix_sums(one, "v", ["c"], with_totals=True).collect()
    assert len(got) == 1 and got[0]["c_xps"] == 0 and got[0]["c_tot"] == 3


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile must be BIT-EQUAL to F.ntile over the same total
    order, across tile counts, tie patterns, and N % n remainders."""
    from biomedical_data_integration_spark.functions.prefix import (
        global_ntile,
    )

    # heavy ties in the key, unique tiebreak, N=103 (odd remainders)
    df = spark.createDataFrame(
        [((i * 3) % 7, i) for i in range(103)], "k bigint, id bigint"
    )
    for n in (2, 4, 5, 103, 200):
        for desc in (False, True):
            order = (
                [F.desc("k"), F.asc("id")] if desc
                else [F.asc("k"), F.asc("id")]
            )
            w = Window.orderBy(*order)
            want = sorted(
                (r["k"], r["id"], r["t"])
                for r in df.select(
                    "k", "id", F.ntile(n).over(w).cast("int").alias("t")
                ).collect()
            )
            got = sorted(
                (r["k"], r["id"], r["t"])
                for r in global_ntile(
                    df, "k", "id", n, "t", descending=desc,
                    kernel="bucketed",
                ).collect()
            )
            assert got == want, f"n={n} desc={desc}"


def test_no_single_task_ordered_window_in_plan(spark):
    """The whole point: the BUCKETED kernel's physical plan must
    contain NO ordered window without a partition key (that is a
    single-task global sort)."""
    import re

    df = spark.createDataFrame(
        [(i, 1) for i in range(100)], "v bigint, c bigint"
    )
    plan = (
        exclusive_prefix_sums(
            df, "v", ["c"], with_totals=True, kernel="bucketed"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = re.findall(
        r"windowspecdefinition\((.*?)specifiedwindowframe", plan
    )
    bad = [s for s in specs if re.match(r"\s*[^,]*\s(ASC|DESC)", s)]
    assert not bad, f"unpartitioned ordered window(s): {bad}"


def test_kernel_policy_routes_and_kernels_agree(spark, monkeypatch):
    """kernel=None consults planning.rank_cumsum_kernel on the counted
    input: below the limit the plain window compiles (one exchange, no
    boundary job), above it the bucketed shape — and both kernels (and
    both ntile kernels) return identical rows."""
    import re

    from biomedical_data_integration_spark import planning
    from biomedical_data_integration_spark.functions.prefix import (
        global_ntile,
    )

    df = spark.createDataFrame(
        [(i * 3 % 101, (i % 7) + 1) for i in range(101)],
        "v bigint, c bigint",
    ).dropDuplicates(["v"])
    keys = ["v", "c_xps"]
    win = exclusive_prefix_sums(df, "v", ["c"], kernel="window")
    bkt = exclusive_prefix_sums(df, "v", ["c"], kernel="bucketed")
    assert _rows(win, keys) == _rows(bkt, keys)
    # policy: small -> window plan (has an unpartitioned ordered spec)
    plan_small = (
        exclusive_prefix_sums(df, "v", ["c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert re.search(
        r"windowspecdefinition\(\s*[^,]*\s(ASC|DESC)", plan_small
    ), "small input should take the single-window kernel"
    # policy override: limit 0 -> bucketed plan (no such spec)
    monkeypatch.setattr(planning, "RANK_SORT_LIMIT", 0)
    plan_big = (
        exclusive_prefix_sums(df, "v", ["c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert not re.search(
        r"windowspecdefinition\(\s*[^,]*\s(ASC|DESC)", plan_big
    ), "past the limit the bucketed kernel must compile"
    # ntile kernels agree too
    ids = spark.createDataFrame(
        [((i * 3) % 7, i) for i in range(53)], "k bigint, id bigint"
    )
    a = sorted(map(tuple, global_ntile(ids, "k", "id", 4, "t",
                                       kernel="window").collect()))
    b = sorted(map(tuple, global_ntile(ids, "k", "id", 4, "t",
                                       kernel="bucketed").collect()))
    assert a == b


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    buckets=st.sampled_from([1, 3, 8, 64]),
)
def test_prefix_sums_property_matches_window(spark, rows, buckets):
    """Fuzzed bit-equality: any unique-key bigint table, any bucketing,
    including negative keys and negative summands."""
    df = spark.createDataFrame(rows, "v bigint, c bigint")
    got = _rows(
        exclusive_prefix_sums(df, "v", ["c"], buckets=buckets),
        ["v", "c_xps"],
    )
    want = _rows(_naive(df, "v", ["c"]), ["v", "c_xps"])
    assert got == want


def test_global_ntile_nan_descending_kernels_agree(spark):
    """Review r8: -NaN is still NaN, so the bucketed kernel used to
    rank a NaN key LAST under descending while the window kernel (desc
    = NaN first, Spark's NaN-above-inf ordering) ranked it FIRST — the
    same data would tile differently on either side of the routing
    limit. Both kernels must agree, including tiles."""
    from biomedical_data_integration_spark.functions.prefix import (
        global_ntile,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 2), (float("nan"), 3), (0.5, 4), (3.0, 5)],
        "k double, id bigint",
    )
    for n in (2, 3, 5):
        a = sorted(
            (r["id"], r["t"])
            for r in global_ntile(
                df, "k", "id", n, "t", descending=True, kernel="window"
            ).collect()
        )
        b = sorted(
            (r["id"], r["t"])
            for r in global_ntile(
                df, "k", "id", n, "t", descending=True, kernel="bucketed"
            ).collect()
        )
        assert a == b, f"n={n}: window={a} bucketed={b}"
        # NaN ranks FIRST under descending -> tile 1
        assert dict(a)[3] == 1


def test_n_rows_hint_skips_routing_count(spark, monkeypatch):
    """A caller-supplied cardinality hint must make kernel routing
    count-free: no ``DataFrame.count`` job may run while the plan is
    built (the 100 TB contract — a routing count is a full scan of the
    collapsed table). The hint is an upper bound: values on either
    side of RANK_SORT_LIMIT route to window/bucketed respectively,
    and both give identical rows."""
    import re

    # patch the CONCRETE class: pyspark.sql.DataFrame is an abstract
    # facade in PySpark 4 — patching it never intercepts the classic
    # session's methods (the value-matching collect test's lesson)
    from pyspark.sql.classic.dataframe import DataFrame

    from biomedical_data_integration_spark.functions.prefix import (
        global_ntile,
    )

    df = spark.createDataFrame(
        [(i * 7 % 97, (i % 5) + 1) for i in range(97)],
        "v bigint, c bigint",
    ).dropDuplicates(["v"])
    ids = spark.createDataFrame(
        [((i * 3) % 7, i) for i in range(53)], "k bigint, id bigint"
    )

    def _forbidden(self):
        raise AssertionError("routing count ran despite n_rows hint")

    monkeypatch.setattr(DataFrame, "count", _forbidden)
    small = exclusive_prefix_sums(df, "v", ["c"], n_rows=97)
    big = exclusive_prefix_sums(df, "v", ["c"], n_rows=10_000_001)
    t_small = global_ntile(ids, "k", "id", 4, "t", n_rows=53)
    t_big = global_ntile(ids, "k", "id", 4, "t", n_rows=10_000_001)
    # hint routes by value: small hint -> single ordered window,
    # oversized hint -> bucketed (no unpartitioned ordered spec)
    pat = r"windowspecdefinition\(\s*[^,]*\s(ASC|DESC)"
    plan_small = (
        small._jdf.queryExecution().executedPlan().toString()
    )
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert re.search(pat, plan_small)
    assert not re.search(pat, plan_big)
    monkeypatch.undo()
    keys = ["v", "c_xps"]
    assert _rows(small, keys) == _rows(big, keys)
    a = sorted(map(tuple, t_small.collect()))
    b = sorted(map(tuple, t_big.collect()))
    assert a == b


def test_window_kernel_skips_checkpoint_job(spark, monkeypatch):
    """Small inputs routed to the window kernel must NOT pay a
    localCheckpoint materialization — the window form reads df exactly
    once (ADVICE round 8)."""
    from pyspark.sql.classic.dataframe import DataFrame

    df = spark.createDataFrame(
        [(i, 1) for i in range(10)], "v bigint, c bigint"
    )

    def _forbidden(self, eager=True):
        raise AssertionError("window kernel checkpointed its input")

    monkeypatch.setattr(DataFrame, "localCheckpoint", _forbidden)
    out = exclusive_prefix_sums(df, "v", ["c"], n_rows=10)
    monkeypatch.undo()
    assert out.count() == 10
