"""Plan-layer semantics: merge_mappings precedence and materialize
validation (reference ``bdikit/api.py:561-737``)."""

import pytest

from biomedical_data_integration_spark import (
    DictionaryMapper,
    materialize_mapping,
    merge_mappings,
)


def test_merge_rejects_duplicates_within_list(spark):
    with pytest.raises(ValueError, match="Duplicate mapping"):
        merge_mappings(
            [{"source": "a", "target": "b"}, {"source": "a", "target": "b"}]
        )


def test_merge_user_precedence_first_wins(spark):
    computed = [
        {"source": "a", "target": "t", "matches": [("x", "computed")]},
        {"source": "b", "target": "u"},
    ]
    user = [{"source": "a", "target": "t", "matches": [("x", "USER")]}]
    plan = merge_mappings(computed, user_mappings=user)
    # user (a,t) wins; computed (a,t) deduped away; (b,u) kept
    assert len(plan) == 2
    first = plan[0]
    assert (first["source"], first["target"]) == ("a", "t")
    assert isinstance(first["mapper"], DictionaryMapper)
    assert first["mapper"].dictionary == {"x": "USER"}


def test_merge_requires_source_and_target(spark):
    with pytest.raises(ValueError, match="source"):
        merge_mappings([{"target": "t"}])


def test_materialize_missing_source_column_raises(spark):
    df = spark.createDataFrame([("a",)], ["x"])
    with pytest.raises(ValueError, match="not found"):
        materialize_mapping(df, [{"source": "nope", "target": "y"}])


def test_materialize_full_pipeline_golden(spark):
    """Mirror of the reference's full-pipeline golden test
    (tests/test_api.py:224-306): harmonize with user overrides, unmatched
    values become null."""
    df = spark.createDataFrame(
        [("Apple", 1), ("Banana", 2), ("Strawberry", 3)], ["fruit", "n"]
    )
    plan = merge_mappings(
        [
            {
                "source": "fruit",
                "target": "fruit_std",
                # Strawberry intentionally unmatched -> null
                "matches": [("Apple", "apple"), ("Banana", "banana")],
            },
            {"source": "n", "target": "count"},
        ],
        user_mappings=[
            {
                "source": "fruit",
                "target": "fruit_upper",
                "mapper": lambda v: v.upper(),
            }
        ],
    )
    out = materialize_mapping(df, plan)
    got = {tuple(r) for r in out.collect()}
    assert got == {
        ("APPLE", "apple", 1),
        ("BANANA", "banana", 2),
        ("STRAWBERRY", None, 3),
    }
    assert out.columns == ["fruit_upper", "fruit_std", "count"]


def test_materialize_accepts_spark_df_spec(spark):
    data = spark.createDataFrame([("x", "y")], ["source", "target"])
    df = spark.createDataFrame([("v",)], ["x"])
    out = materialize_mapping(df, data)
    assert out.columns == ["y"]
    assert out.first()["y"] == "v"


def test_plan_json_round_trip(spark, tmp_path):
    from biomedical_data_integration_spark.plans.persist import (
        load_plan,
        plan_to_json,
        save_plan,
    )
    from biomedical_data_integration_spark.plans.spec import materialize_mapping
    from biomedical_data_integration_spark.plans.mappers import (
        DictionaryMapper,
        ExpressionValueMapper,
    )

    spec = [
        {"source": "a", "target": "ident"},
        {"source": "a", "target": "up",
         "mapper": ExpressionValueMapper("upper({col})")},
        {"source": "b", "target": "mapped",
         "mapper": DictionaryMapper({"1": "one", "2": "two"})},
    ]
    path = str(tmp_path / "plan.json")
    save_plan(spec, path)
    loaded = load_plan(path)

    df = spark.createDataFrame([("x", "1"), ("y", "3")], "a string, b string")
    want = [tuple(r) for r in materialize_mapping(df, spec).orderBy("ident").collect()]
    got = [tuple(r) for r in materialize_mapping(df, loaded).orderBy("ident").collect()]
    assert got == want
    assert want == [("x", "X", "one"), ("y", "Y", None)]
    # stable output: serializing twice gives identical text (diff-friendly)
    assert plan_to_json(spec) == plan_to_json(loaded)


def test_plan_json_rejects_function_mapper(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.plans.persist import plan_to_json
    from biomedical_data_integration_spark.plans.mappers import (
        FunctionValueMapper,
    )

    spec = [{"source": "a", "target": "t",
             "mapper": FunctionValueMapper(lambda x: x)}]
    with _pytest.raises(ValueError, match="ExpressionValueMapper"):
        plan_to_json(spec)


def test_plan_json_rejects_unknown_version():
    import pytest as _pytest

    from biomedical_data_integration_spark.plans.persist import plan_from_json

    with _pytest.raises(ValueError, match="version"):
        plan_from_json('{"version": 99, "mappings": []}')


def test_plan_summary_counts(spark):
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.plans.inspect import (
        assert_scalable,
        plan_summary,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    simple = df.where(F.col("l_quantity") > 10).select("l_orderkey")
    s = plan_summary(simple)
    assert s["n_scans"] == 1
    assert s["n_exchanges"] == 0
    assert not s["python_exec"] and not s["cartesian"]
    assert s["pushed_filters"]  # predicate reached the parquet scan

    grouped = df.groupBy("l_returnflag").count()
    sg = plan_summary(grouped)
    assert sg["n_exchanges"] >= 1

    # budget enforcement
    assert_scalable(simple, max_exchanges=0)
    try:
        assert_scalable(grouped, max_exchanges=0)
        raise RuntimeError("should have raised")
    except AssertionError as e:
        assert "shuffles" in str(e)


def test_plan_summary_flags_python_and_cartesian(spark):
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.plans.inspect import plan_summary

    a = spark.range(3)
    b = spark.range(3)
    cart = a.crossJoin(b)
    assert plan_summary(cart)["cartesian"]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _f(s):
        return s

    py = a.select(_f(F.col("id")))
    assert plan_summary(py)["python_exec"]
