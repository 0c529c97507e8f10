"""SparkSession helpers.

The engine is a library: it never owns the session, but provides a
constructor with scale-appropriate defaults. All knobs are plain Spark SQL
configuration — AQE for runtime re-planning (skew joins, coalesced
shuffles), Arrow for the pandas-UDF boundary, UTC so timestamp results are
stable against any oracle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "biomedical-data-integration-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Return the active session or build one with engine defaults.

    On a real cluster, ``master``/``shuffle_partitions`` come from
    spark-submit; locally we default to ``local[*]`` and a modest shuffle
    width so tiny test inputs don't fan out into thousands of empty tasks
    (AQE coalescing handles the rest).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Similarity kernels do intentional cartesian joins on *distinct
        # value domains* (small relations); don't make users opt in per-job.
        .config("spark.sql.crossJoin.enabled", "true")
    )
    if master is not None:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None:
        builder = builder.master("local[*]")
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    return builder.getOrCreate()
