"""Temporal joins (asof_join) — backward-inclusive semantics, tolerance,
determinism under repartitioning."""

import datetime as dt

from biomedical_data_integration_spark.operators.joins import asof_join


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(12), "b"), (2, _ts(9), "c")],
        ["user_id", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts(9, 30), 10.0), (1, _ts(11), 20.0), (2, _ts(9, 30), 30.0),
         (1, _ts(12), 99.0)],
        ["user_id", "ts", "v"],
    )
    rows = {
        (r["user_id"], r["ts"]): (r["asof_ts"], r["v"], r["tag"])
        for r in asof_join(left, right).collect()
    }
    assert rows[(1, _ts(10))] == (_ts(9, 30), 10.0, "a")
    # equal timestamps match (inclusive): the 12:00 right row wins over 11:00
    assert rows[(1, _ts(12))] == (_ts(12), 99.0, "b")
    # user 2's event precedes every right row -> null match
    assert rows[(2, _ts(9))] == (None, None, "c")
    assert len(rows) == 3  # exactly one output row per left row


def test_asof_join_tolerance_and_equal_ts_ties(spark):
    left = spark.createDataFrame([(1, _ts(12), 1)], ["user_id", "ts", "x"])
    right = spark.createDataFrame(
        # two right rows at the SAME ts: lexicographically greatest wins
        [(1, _ts(8), 5.0), (1, _ts(8), 7.0)],
        ["user_id", "ts", "v"],
    )
    out = asof_join(left, right).collect()[0]
    assert out["v"] == 7.0
    # 4h-old match rejected by a 1h tolerance
    out_tol = asof_join(left, right, tolerance_seconds=3600).collect()[0]
    assert out_tol["v"] is None and out_tol["asof_ts"] is None


def test_asof_join_deterministic_under_partitioning(spark):
    left = spark.createDataFrame(
        [(i % 5, _ts(9 + i % 8, i % 60), i) for i in range(200)],
        ["user_id", "ts", "x"],
    )
    right = spark.createDataFrame(
        [(i % 5, _ts(8 + i % 9, (i * 7) % 60), float(i)) for i in range(100)],
        ["user_id", "ts", "v"],
    )
    a = {tuple(r) for r in asof_join(left, right).collect()}
    b = {
        tuple(r)
        for r in asof_join(left.repartition(13), right.repartition(3)).collect()
    }
    assert a == b and len(a) == 200


def test_interval_join_inner_and_overlaps(spark):
    from biomedical_data_integration_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, 100, "p1"), (1, 5000, "p2"), (2, 100, "p3")],
        ["user_id", "ts", "tag"],
    )
    intervals = spark.createDataFrame(
        # user 1: two OVERLAPPING intervals covering ts=100; none covers 5000
        [(1, 50, 200, "a"), (1, 90, 110, "b"), (2, 300, 400, "c")],
        ["user_id", "session_start", "session_end", "ivl"],
    )
    out = interval_join(points, intervals, bucket_seconds=1000).collect()
    got = {(r["tag"], r["ivl"]) for r in out}
    assert got == {("p1", "a"), ("p1", "b")}  # both overlaps; p2/p3 uncovered


def test_interval_join_left_keeps_uncovered_points(spark):
    from biomedical_data_integration_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, 100, "p1"), (1, 5000, "p2")], ["user_id", "ts", "tag"]
    )
    intervals = spark.createDataFrame(
        [(1, 50, 200, "a"), (1, 90, 110, "b")],
        ["user_id", "session_start", "session_end", "ivl"],
    )
    rows = interval_join(
        points, intervals, bucket_seconds=1000, how="left"
    ).collect()
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r["tag"], []).append(r["ivl"])
    assert sorted(by_tag["p1"]) == ["a", "b"]   # overlaps preserved
    assert by_tag["p2"] == [None]               # exactly one null row


def test_interval_join_left_preserves_duplicate_uncovered_points(spark):
    from biomedical_data_integration_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        # two EXACTLY identical uncovered rows + two identical covered rows
        [(1, 5000, "dup"), (1, 5000, "dup"), (1, 100, "cov"), (1, 100, "cov")],
        ["user_id", "ts", "tag"],
    )
    intervals = spark.createDataFrame(
        [(1, 50, 200, "a")],
        ["user_id", "session_start", "session_end", "ivl"],
    )
    rows = interval_join(
        points, intervals, bucket_seconds=1000, how="left"
    ).collect()
    tags = sorted((r["tag"], r["ivl"]) for r in rows)
    # left-join multiplicity: BOTH uncovered duplicates survive as null rows
    assert tags == [("cov", "a"), ("cov", "a"), ("dup", None), ("dup", None)]


def test_asof_join_tolerance_with_numeric_ts(spark):
    # epoch-seconds bigint ts: tolerance must use raw arithmetic, not
    # unix_timestamp() (which nulls out on non-timestamp input)
    left = spark.createDataFrame([(1, 10000, "x")], ["user_id", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, 9000, 1.0), (1, 2000, 2.0)], ["user_id", "ts", "v"]
    )
    ok = asof_join(left, right, tolerance_seconds=2000).collect()[0]
    assert ok["v"] == 1.0 and ok["asof_ts"] == 9000
    rej = asof_join(left, right, tolerance_seconds=500).collect()[0]
    assert rej["v"] is None and rej["asof_ts"] is None


def test_interval_join_spans_buckets(spark):
    from biomedical_data_integration_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, 2500, "p")], ["user_id", "ts", "tag"]
    )
    intervals = spark.createDataFrame(
        # interval spans buckets 0..3 with bucket_seconds=1000
        [(1, 100, 3900, "long")],
        ["user_id", "session_start", "session_end", "ivl"],
    )
    out = interval_join(points, intervals, bucket_seconds=1000).collect()
    assert len(out) == 1 and out[0]["ivl"] == "long"


# ---------------------------------------------------------------------------
# property-based equivalence vs pandas merge_asof
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_row = st.tuples(
    st.integers(min_value=0, max_value=3),     # key
    st.integers(min_value=0, max_value=50),    # epoch-second ts
    st.integers(min_value=0, max_value=99),    # value
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(_row, min_size=1, max_size=25),
    rrows=st.lists(_row, min_size=1, max_size=25),
)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    import pandas as pd

    left = spark.createDataFrame(
        [(k, t, v) for k, t, v in lrows], ["user_id", "ts", "x"]
    )
    right = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in rrows], ["user_id", "ts", "v"]
    )
    got = {
        (r["user_id"], r["ts"], r["x"], r["v"])
        for r in asof_join(left, right, value_cols=["v"]).collect()
    }

    lp = pd.DataFrame(lrows, columns=["user_id", "ts", "x"]).sort_values("ts")
    rp = (
        pd.DataFrame([(k, t, float(v)) for k, t, v in rrows],
                     columns=["user_id", "ts", "v"])
        # mirror the operator's deterministic equal-ts dedup (max value)
        .groupby(["user_id", "ts"], as_index=False)["v"].max()
        .sort_values("ts")
    )
    merged = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward",
        allow_exact_matches=True,
    )
    want = {
        (r.user_id, r.ts, r.x, None if pd.isna(r.v) else r.v)
        for r in merged.itertuples()
    }
    # multiset-as-set is safe: duplicate left rows produce identical tuples
    # on both sides
    assert got == want


def test_asof_join_forward_direction(spark):
    import datetime as dt

    from biomedical_data_integration_spark.operators.joins import asof_join

    def ts(h, m=0):
        return dt.datetime(2026, 1, 1, h, m)

    left = spark.createDataFrame(
        [(1, ts(10), "a"), (1, ts(12), "b"), (1, ts(15), "c"),
         (2, ts(9), "d")],
        ["user_id", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, ts(11), 10.0), (1, ts(12), 20.0), (1, ts(14), 30.0)],
        ["user_id", "ts", "v"],
    )
    got = {
        r["tag"]: (r["asof_ts"], r["v"])
        for r in asof_join(
            left, right, value_cols=["v"], direction="forward"
        ).collect()
    }
    assert got["a"] == (ts(11), 10.0)   # next right after 10:00
    assert got["b"] == (ts(12), 20.0)   # inclusive at equal ts
    assert got["c"] == (None, None)     # nothing follows 15:00
    assert got["d"] == (None, None)     # no rights for user 2

    # forward tolerance: a 30-minute window excludes the 11:00 match
    tol = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, value_cols=["v"], direction="forward",
            tolerance_seconds=1800,
        ).collect()
    }
    assert tol["a"] is None and tol["b"] == 20.0


def test_asof_join_rejects_bad_direction(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.joins import asof_join

    df = spark.createDataFrame([(1, 1, 1.0)], ["user_id", "ts", "v"])
    with _pytest.raises(ValueError, match="direction"):
        asof_join(df, df, direction="nearest")
