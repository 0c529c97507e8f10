"""Unit tests for the mapper layer (reference
``tests/test_mapping_functions.py`` coverage, SURVEY §2.2)."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark import (
    DictionaryMapper,
    FunctionValueMapper,
    IdentityValueMapper,
    create_mapper,
    materialize_mapping,
)


def test_identity_mapper_copies_column(spark):
    df = spark.createDataFrame([("a",), ("b",), (None,)], ["x"])
    out = df.select(IdentityValueMapper().expr("x").alias("y"))
    assert [r["y"] for r in out.collect()] == ["a", "b", None]


def test_function_mapper_elementwise_with_null_passthrough(spark):
    df = spark.createDataFrame([("apple",), (None,), ("fig",)], ["x"])
    out = df.select(FunctionValueMapper(lambda v: v.upper()).expr("x").alias("y"))
    assert [r["y"] for r in out.collect()] == ["APPLE", None, "FIG"]


def test_function_mapper_numeric_return_type(spark):
    df = spark.createDataFrame([(1.0,), (2.5,)], ["x"])
    m = FunctionValueMapper(lambda v: v * 2, return_type="double")
    out = df.select(m.expr("x").alias("y"))
    assert [r["y"] for r in out.collect()] == [2.0, 5.0]


def test_dictionary_mapper_missing_key_is_null(spark):
    df = spark.createDataFrame([("R",), ("A",), ("Z",), (None,)], ["x"])
    m = DictionaryMapper({"R": "returned", "A": "accepted"})
    out = df.select(m.expr("x").alias("y"))
    assert [r["y"] for r in out.collect()] == ["returned", "accepted", None, None]


def test_dictionary_mapper_int_keys_coerced(spark):
    # reference test coerces int->float with NaN (test_mapping_functions.py:34-60)
    df = spark.createDataFrame([(1,), (2,), (9,)], ["x"])
    m = DictionaryMapper({"1": "one", "2": "two"})
    out = df.select(m.expr("x").alias("y"))
    assert [r["y"] for r in out.collect()] == ["one", "two", None]


def test_large_dictionary_uses_broadcast_join(spark):
    big = {f"k{i}": f"v{i}" for i in range(10_001)}
    m = DictionaryMapper(big)
    assert m.is_large()
    with pytest.raises(ValueError):
        m.expr("x")
    df = spark.createDataFrame([("k7",), ("nope",)], ["x"])
    out = m.rewrite(df, "x", "y")
    got = {(r["x"], r["y"]) for r in out.collect()}
    assert got == {("k7", "v7"), ("nope", None)}


def test_create_mapper_polymorphism(spark):
    # None -> identity
    assert isinstance(create_mapper(None), IdentityValueMapper)
    # callable -> function
    assert isinstance(create_mapper(lambda v: v), FunctionValueMapper)
    # list of (source, target) matches -> dictionary
    m = create_mapper([("a", "A"), ("b", "B")])
    assert isinstance(m, DictionaryMapper)
    assert m.dictionary == {"a": "A", "b": "B"}
    # dict spec -> recurse
    m2 = create_mapper({"matches": [("x", "X")]})
    assert isinstance(m2, DictionaryMapper)
    # existing mapper passes through
    ident = IdentityValueMapper()
    assert create_mapper(ident) is ident


def test_materialize_single_projection_no_shuffle(spark):
    df = spark.createDataFrame([("R", 1.0), ("N", 2.0)], ["flag", "qty"])
    out = materialize_mapping(
        df,
        [
            {"source": "flag", "target": "rf", "matches": [("R", "ret"), ("N", "none")]},
            {"source": "qty", "target": "quantity"},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: streams at any scale
    assert {tuple(r) for r in out.collect()} == {("ret", 1.0), ("none", 2.0)}


def test_expression_value_mapper_jvm_path(spark):
    from biomedical_data_integration_spark import (
        ExpressionValueMapper,
        create_mapper,
        materialize_mapping,
    )

    df = spark.createDataFrame([(" a ", 2.0), ("b", 3.5)], ["raw", "qty"])
    out = materialize_mapping(
        df,
        [
            {"source": "raw", "target": "clean", "mapper": "upper(trim({col}))"},
            {
                "source": "qty",
                "target": "cents",
                "mapper": ExpressionValueMapper("cast({col} * 100 as int)"),
            },
        ],
    )
    rows = {r["clean"]: r["cents"] for r in out.collect()}
    assert rows == {"A": 200, "B": 350}
    # no pandas UDF in the plan — stays in codegen
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # placeholder required
    import pytest as _pytest

    with _pytest.raises(ValueError, match="{col}"):
        create_mapper("upper(x)")


def test_expression_value_mapper_literal_braces(spark):
    """Regex quantifiers and other literal braces in the SQL expression
    must survive substitution (plain replace, not str.format)."""
    from biomedical_data_integration_spark import (
        ExpressionValueMapper,
        materialize_mapping,
    )

    df = spark.createDataFrame([("ab123cd",), ("x99y",)], ["raw"])
    out = materialize_mapping(
        df,
        [
            {
                "source": "raw",
                "target": "masked",
                "mapper": ExpressionValueMapper(
                    "regexp_replace({col}, '[0-9]{3}', 'XXX')"
                ),
            }
        ],
    )
    assert {r["masked"] for r in out.collect()} == {"abXXXcd", "x99y"}
