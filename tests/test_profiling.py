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
