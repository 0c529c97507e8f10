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
