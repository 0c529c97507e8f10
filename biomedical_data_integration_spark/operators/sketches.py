"""Deterministic distributed sketches: count-min (frequency) and KMV
(distinct-count) — the mergeable-summary family a 100 TB pipeline uses
where exact aggregation is too wide to keep.

Unlike Spark's built-in approx aggregates (HyperLogLog++,
``approx_count_distinct``), these sketches are built on salted md5, so
they are BIT-DETERMINISTIC across engines and partitionings: the same
input yields the same sketch in Spark, DuckDB, or any SQL engine — which
makes them oracle-checkable AND safely mergeable across days/clusters
(sketch union = counter addition / min-set merge, both order-free).

The reference has no sketches (its only hashing is a SHA-256 cache
fingerprint, ``bdikit/utils.py:8-18``); this is the BASELINE.json
"novel sketch" extension implemented Spark-first:

- :func:`countmin_sketch` — depth x width counters as a SPARSE table
  ``(depth, pos, count)``: one explode to (row, depth) pairs + one
  map-side-combinable groupBy. Sketch size <= depth * width rows no
  matter the corpus; shuffle carries counters, not values.
- :func:`cms_estimate` — point-frequency upper bounds for candidate
  items: min over depth rows of the matching counters (classic CMS
  guarantee: estimate >= true count, overestimates bounded by n/width
  per row with prob 1 - 2^-depth).
- :func:`kmv_distinct` — k-minimum-values distinct estimate: keep the k
  smallest normalized hash values of the DISTINCT domain; if fewer than
  k exist the count is exact, else estimate (k-1)/h_k. One distinct +
  one global bottom-k (TakeOrderedAndProject — no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biomedical_data_integration_spark.functions.hashing import md5_bigint

HASH_SCALE = 16 ** 15  # md5_bigint range: first 15 hex chars


def countmin_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Build a count-min sketch of ``col``'s value frequencies as a sparse
    ``(depth, pos, count)`` table (absent cells are zero).

    Row r of the sketch uses hash ``md5("{salt}{r}|" + value) mod width``;
    counts are plain bigint sums, so two sketches built with the same
    (salt, width, depth) merge by ``unionByName + groupBy.sum`` — the
    standard mergeability that makes CMS work across partitions, days,
    and clusters.
    """
    if width < 1 or depth < 1:
        raise ValueError("countmin_sketch: width and depth must be >= 1")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        (md5_bigint(F.col(col), salt=f"{salt}{d}") % width)
                        .cast("int")
                        .alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell")
    )
    return (
        rows.select(F.col("__cell.depth").alias("depth"),
                    F.col("__cell.pos").alias("pos"))
        .groupBy("depth", "pos")
        .agg(F.count("*").alias("count"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Estimate each item's frequency from a :func:`countmin_sketch` built
    with the same parameters: ``min`` over the depth counters the item
    hashes to (0 if a cell is absent). Returns ``(item_col, est_count)``.

    The probe is an equi-join on (depth, pos) — items x depth rows against
    the <= depth*width-row sketch, which broadcasts at any realistic
    width."""
    probes = items.select(F.col(item_col)).distinct()
    cells = probes.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        (md5_bigint(F.col(item_col), salt=f"{salt}{d}") % width)
                        .cast("int")
                        .alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select(
        item_col,
        F.col("__cell.depth").alias("depth"),
        F.col("__cell.pos").alias("pos"),
    )
    joined = cells.join(F.broadcast(sketch), ["depth", "pos"], "left").select(
        item_col, F.coalesce(F.col("count"), F.lit(0)).alias("__c")
    )
    return joined.groupBy(item_col).agg(F.min("__c").alias("est_count"))


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct-count estimate of ``col``.

    Returns one row ``(n_kept, kth_hash, distinct_estimate)``:
    ``distinct_estimate`` equals the exact distinct count when the domain
    has fewer than ``k`` values, else ``(k-1) / h_k`` with ``h_k`` the
    k-th smallest hash normalized to [0, 1). Deterministic: the "random"
    ordering is salted md5, identical in every engine.
    """
    if k < 2:
        raise ValueError("kmv_distinct: k must be >= 2")
    hashed = (
        df.select(F.col(col))
        .where(F.col(col).isNotNull())
        .distinct()
        .select(
            (md5_bigint(F.col(col), salt=salt).cast("double") / HASH_SCALE)
            .alias("__h")
        )
    )
    bottom = hashed.orderBy("__h").limit(k)
    return bottom.agg(
        F.count("*").alias("n_kept"),
        F.round(F.max("__h"), 12).alias("kth_hash"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                (F.lit(float(k - 1))) / F.max("__h")
            ),
            6,
        ).alias("distinct_estimate"),
    )


def streaming_countmin(
    stream: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Streaming face of :func:`countmin_sketch`: the identical cell
    projection + counting aggregation compiled onto a streaming
    DataFrame. Because CMS counters are pure additive state, Spark's
    built-in streaming aggregation IS the sketch maintenance — state is
    bounded by depth x width cells regardless of stream volume, and a
    snapshot of the output (complete/update mode) equals the batch sketch
    over the same prefix of the stream (tested).

    Probe snapshots with :func:`cms_estimate` exactly like batch sketches.
    """
    if width < 1 or depth < 1:
        raise ValueError("streaming_countmin: width and depth must be >= 1")
    rows = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        (md5_bigint(F.col(col), salt=f"{salt}{d}") % width)
                        .cast("int")
                        .alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell")
    )
    return (
        rows.select(F.col("__cell.depth").alias("depth"),
                    F.col("__cell.pos").alias("pos"))
        .groupBy("depth", "pos")
        .agg(F.count("*").alias("count"))
    )
