"""Public API — mirrors the reference's nine functions (SURVEY §2.1,
``bdikit/api.py``), DataFrames in / DataFrames out.

Differences forced by Spark, all documented in SURVEY §1.4/§7.3:
- no ``DataFrame.attrs`` side-channel -> match results carry
  ``source_column`` / ``target_column`` / ``coverage`` as plain columns;
- ``match_values`` returns ONE long DataFrame covering every mapped pair
  (the reference returns a list of per-pair frames; use
  ``split_value_matches`` for that view);
- similarity scores are rounded and totally ordered, so results are
  deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biomedical_data_integration_spark import config
from biomedical_data_integration_spark.operators.schema_matching import (
    get_schema_matcher,
    one_to_one_assignment,
)
from biomedical_data_integration_spark.operators.value_matching import (
    get_value_matcher,
    match_values_pipeline,
    normalize_column_mapping,
)
from biomedical_data_integration_spark.plans.spec import (  # noqa: F401 (re-export)
    create_mapper,
    materialize_mapping,
    merge_mappings,
)
from biomedical_data_integration_spark.sources.standards import Standard, get_standard


def _resolve_target_table(
    spark: SparkSession, target: Union[str, DataFrame, Standard]
) -> DataFrame:
    """Standard name -> wide vocabulary table (``bdikit/api.py:88-96``)."""
    if isinstance(target, DataFrame):
        return target
    if isinstance(target, str):
        target = get_standard(target)
    if isinstance(target, Standard):
        return target.to_wide_df(spark)
    raise ValueError(f"Invalid target: {target!r}")


def match_schema(
    source: DataFrame,
    target: Union[str, DataFrame, Standard] = "gdc",
    method: str = config.DEFAULT_SCHEMA_MATCHING_METHOD,
    method_args: Optional[Dict] = None,
) -> DataFrame:
    """1:1 column mapping source -> target schema (``bdikit/api.py:43-85``).

    Returns a small DataFrame (source, target); unmatched sources get ""
    (``one2one/base.py:9-15``).
    """
    spark = source.sparkSession
    target_df = _resolve_target_table(spark, target)
    matcher = get_schema_matcher(method, **(method_args or {}))
    scores = matcher.scores(source, target_df)
    assignment = one_to_one_assignment(scores, source.columns)
    return spark.createDataFrame(assignment, "source string, target string")


def top_matches(
    source: DataFrame,
    columns: Optional[List[str]] = None,
    target: Union[str, DataFrame, Standard] = "gdc",
    top_k: int = config.DEFAULT_SCHEMA_TOP_K,
    method: str = "ct_learning",
    method_args: Optional[Dict] = None,
) -> DataFrame:
    """Top-k candidate target columns per source column
    (``bdikit/api.py:99-152``): score -> window top-k."""
    spark = source.sparkSession
    if columns:
        source = source.select(*columns)
    target_df = _resolve_target_table(spark, target)
    matcher = get_schema_matcher(method, **(method_args or {}))
    scores = matcher.scores(source, target_df)
    w = Window.partitionBy("source").orderBy(F.desc("similarity"), F.asc("target"))
    return (
        scores.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= top_k)
        .select("source", "target", "similarity")
    )


def match_values(
    source: DataFrame,
    target: Union[str, DataFrame, Standard],
    column_mapping,
    method: str = config.DEFAULT_VALUE_MATCHING_METHOD,
    threshold: float = config.DEFAULT_VALUE_MATCHING_THRESHOLD,
    method_args: Optional[Dict] = None,
) -> DataFrame:
    """Best (top-1) target value per distinct source value for every mapped
    column pair (``bdikit/api.py:155-219``; forces top_k=1 at ``:201-205``).

    Output: (source_column, target_column, source_value, target_value,
    similarity, coverage); unmatched values carry null target/similarity.
    """
    return match_values_pipeline(
        source,
        target,
        column_mapping,
        method=method,
        top_k=1,
        threshold=threshold,
        include_unmatched=True,
        method_args=method_args,
    )


def top_value_matches(
    source: DataFrame,
    target: Union[str, DataFrame, Standard],
    column_mapping,
    top_k: int = config.DEFAULT_VALUE_TOP_K,
    method: str = config.DEFAULT_VALUE_MATCHING_METHOD,
    threshold: float = config.DEFAULT_VALUE_MATCHING_THRESHOLD,
    method_args: Optional[Dict] = None,
) -> DataFrame:
    """Top-k target values per source value (``bdikit/api.py:222-288``)."""
    return match_values_pipeline(
        source,
        target,
        column_mapping,
        method=method,
        top_k=top_k,
        threshold=threshold,
        include_unmatched=True,
        method_args=method_args,
    )


def split_value_matches(matches: DataFrame) -> Dict[tuple, DataFrame]:
    """Per-pair view of a long match result (the reference's list-of-frames
    shape, ``api.py:209-217``). Driver-side split — pairs are few."""
    pairs = [
        (r["source_column"], r["target_column"])
        for r in matches.select("source_column", "target_column").distinct().collect()
    ]
    return {
        (s, t): matches.where(
            (F.col("source_column") == s) & (F.col("target_column") == t)
        )
        for s, t in pairs
    }


def view_value_matches(matches: DataFrame, n: int = 50) -> None:
    """Notebook display helper (``bdikit/api.py:291-330`` renders a Panel
    widget; engine-side this is a grouped console view)."""
    matches.orderBy(
        "source_column", "target_column", F.desc("similarity")
    ).show(n, truncate=False)


def preview_domain(
    dataset: Union[str, DataFrame, Standard],
    column: str,
    limit: Optional[int] = None,
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Distinct values of a column, or vocabulary metadata when ``dataset``
    is a standard name (``bdikit/api.py:495-552``).

    Standard branch -> (value_name, value_description, column_description);
    DataFrame branch -> (value_name).
    """
    if isinstance(dataset, str):
        dataset = get_standard(dataset)
    if isinstance(dataset, Standard):
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("Pass spark= when previewing a standard's domain")
        meta = dataset.get_column_metadata([column])
        if column not in meta:
            raise ValueError(f"Column {column!r} not found in the standard")
        m = meta[column]
        rows = list(zip(m["value_names"], m["value_descriptions"]))
        if limit is not None:
            rows = rows[:limit]  # api.py:536-538
        df = spark.createDataFrame(
            rows or [], "value_name string, value_description string"
        ) if rows else spark.createDataFrame(
            [], "value_name string, value_description string"
        )
        return df.withColumn("column_description", F.lit(m["description"]))
    # DataFrame branch: distinct values (api.py:528)
    out = (
        dataset.select(F.col(column).cast("string").alias("value_name"))
        .where(F.col(column).isNotNull())
        .distinct()
    )
    if limit is not None:
        out = out.orderBy("value_name").limit(limit)
    return out
