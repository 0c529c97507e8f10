"""BFS distances, golden-record survivorship, and missing-value imputation."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.graph import bfs_distances
from biomedical_data_integration_spark.operators.linkage import golden_record
from biomedical_data_integration_spark.operators.profiling import impute_missing


def _edges(spark):
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        ["src", "dst"],
    )


def test_bfs_min_hop_distances(spark):
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["distance"]
        for r in bfs_distances(_edges(spark), seeds, max_hops=3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # 'e' is 4 hops out, 'x'/'y' unreachable -> absent


def test_bfs_undirected_and_multi_source(spark):
    seeds = spark.createDataFrame([("c",), ("x",)], ["node"])
    got = {
        r["node"]: r["distance"]
        for r in bfs_distances(
            _edges(spark), seeds, max_hops=2, directed=False
        ).collect()
    }
    assert got["c"] == 0 and got["x"] == 0
    assert got["b"] == 1 and got["d"] == 1 and got["y"] == 1
    assert got["a"] == 2 and got["e"] == 2


def test_bfs_early_stop_on_empty_frontier(spark):
    seeds = spark.createDataFrame([("x",)], ["node"])
    got = bfs_distances(_edges(spark), seeds, max_hops=10).collect()
    assert {r["node"]: r["distance"] for r in got} == {"x": 0, "y": 1}


def test_golden_record_mode_with_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "Alice", "NYC"),
            (1, "Alice", "NY"),
            (1, "alice", None),
            (2, "Bob", "LA"),
        ],
        ["cluster", "name", "city"],
    )
    got = {r["cluster"]: r for r in golden_record(df, "cluster").collect()}
    assert got[1]["name"] == "Alice"  # modal (2 of 3)
    assert got[1]["city"] == "NY"  # tie 1-1 -> smallest value; null ignored
    assert got[1]["n_members"] == 3
    assert got[2]["name"] == "Bob" and got[2]["n_members"] == 1


def test_golden_record_validates(spark):
    df = spark.createDataFrame([(1,)], ["cluster"])
    with pytest.raises(ValueError):
        golden_record(df, "cluster")


def test_impute_mean_and_flags(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, "b", 30.0), (4, "b", None)],
        ["id", "g", "v"],
    )
    got = {
        r["id"]: r
        for r in impute_missing(df, ["v"], "mean", group_col="g").collect()
    }
    assert got[2]["v"] == 10.0 and got[2]["v_was_null"] is True
    assert got[4]["v"] == 30.0
    assert got[1]["v"] == 10.0 and got[1]["v_was_null"] is False


def test_impute_median_type1_even_count(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4])] + [(9, None)],
        "id bigint, v double",
    )
    got = {r["id"]: r["v"] for r in impute_missing(df, ["v"], "median").collect()}
    assert got[9] == 2.0  # type-1: rank ceil(4/2)=2 -> lower middle


def test_impute_mode_and_constant(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, None)], ["id", "s"]
    )
    got = {r["id"]: r["s"] for r in impute_missing(df, ["s"], "mode").collect()}
    assert got[4] == "x"
    got2 = {
        r["id"]: r["s"]
        for r in impute_missing(df, ["s"], "constant", fill_value="?").collect()
    }
    assert got2[4] == "?"


def test_impute_validates(spark):
    df = spark.createDataFrame([(1, 1.0)], ["id", "v"])
    with pytest.raises(ValueError):
        impute_missing(df, ["v"], "nope")
    with pytest.raises(ValueError):
        impute_missing(df, [], "mean")
    with pytest.raises(ValueError):
        impute_missing(df, ["v"], "constant")
