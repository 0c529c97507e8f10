"""Sinks.

The reference has none (every API returns an in-memory frame, SURVEY §2.7
"sink: none"); a Spark engine needs real ones. Thin, explicit wrappers —
the value is the scale-relevant defaults, not abstraction:

- parquet is the default interchange format (columnar, predicate/column
  pushdown on re-read);
- ``partition_by`` maps to directory partitioning (partition pruning on
  downstream scans);
- ``max_records_per_file`` bounds output file sizes so a 100 TB write
  doesn't produce multi-GB files that downstream readers can't split on
  row groups;
- small harmonization *results* (match tables, plans) round-trip through
  ``toPandas`` at the API edge — that is the parity shim with the
  reference's in-memory returns, not a data-plane sink.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: Optional[List[str]] = None,
    max_records_per_file: Optional[int] = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "error",
    header: bool = True,
    partition_by: Optional[List[str]] = None,
) -> None:
    w = df.write.mode(mode).option("header", str(header).lower())
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: List[str],
    num_buckets: int = 32,
    sort_by: Optional[List[str]] = None,
    mode: str = "error",
    path: Optional[str] = None,
) -> None:
    """Persist as a BUCKETED (and optionally sorted) parquet table — the
    co-location primitive for repeated large joins/aggregations.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT an Exchange on either side (bucket pruning also applies to
    single-key lookups); with ``sort_by`` the sort-merge join's per-task
    sort disappears too. At 100 TB this converts every recurring
    fact-to-fact join on the bucket key from a full shuffle of both
    inputs into a zipped per-bucket merge — the single biggest repeated
    cost a warehouse layout decision can remove. Bucketing requires the
    table catalog (``saveAsTable``); plain ``parquet(path)`` files carry
    no bucket metadata.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
