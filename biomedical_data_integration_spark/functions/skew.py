"""Skew-mitigation primitives for hot-key joins and aggregations.

AQE's skew-join splitting (on by default in the engine session,
``session.py``) handles most runtime skew; these helpers cover the cases
AQE can't re-plan:

- :func:`salted_join` — a sort-merge/shuffle equi-join where one key
  dominates (the classic power-law key). The large side gets a
  deterministic salt derived from its row content; the small side is
  replicated once per salt value, so the hot key spreads over ``salts``
  reducers instead of one straggler.
- :func:`salted_aggregate` — two-phase aggregation for algebraic
  aggregates (count/sum/min/max): partial by (keys, salt), final by keys.
  Hash aggregation already does map-side partials, so this only matters
  when a single group's *partial results* still overwhelm one reducer —
  i.e. billions of rows per key at 100 TB.

Everything is deterministic (salts come from ``xxhash64`` of row values,
not ``rand()``), so salted plans remain oracle-reproducible: salting never
changes results, only placement.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__skew_salt"


def _content_salt(df: DataFrame, salts: int):
    """Deterministic per-row salt in [0, salts): hash of the whole row.
    Identical rows share a salt — acceptable: placement skew only recurs
    if one exact row dominates, which dedup/pre-aggregation should handle."""
    return F.pmod(
        F.xxhash64(*[F.col(c).cast("string") for c in df.columns]), F.lit(salts)
    ).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Join keys become ``on + [salt]``: each hot key's rows scatter across
    ``salts`` partitions, each holding one replica of the matching small
    rows. Results are identical to ``large.join(small, on, how)``.
    ``how`` supports inner/left — the replicated side must be the
    *preserved-row-free* side, so right/full are rejected rather than
    silently multiplying rows.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(replicating the small side would duplicate preserved rows)"
        )
    on = list(on)
    l_salted = large.withColumn(SALT_COL, _content_salt(large, salts))
    s_replicated = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l_salted.join(s_replicated, on + [SALT_COL], how).drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    counts: Sequence[str] = (),
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    salts: int = 64,
) -> DataFrame:
    """Two-phase algebraic aggregation: partial per (keys, salt) then
    final per keys. Output columns: ``count`` (if requested via
    ``counts=["*"]``), ``sum_<c>``, ``min_<c>``, ``max_<c>``.
    """
    keys = list(keys)
    partial_aggs: List = []
    final_aggs: List = []
    if counts:
        partial_aggs.append(F.count("*").alias("__cnt"))
        final_aggs.append(F.sum("__cnt").alias("count"))
    for c in sums:
        partial_aggs.append(F.sum(c).alias(f"__sum_{c}"))
        final_aggs.append(F.sum(f"__sum_{c}").alias(f"sum_{c}"))
    for c in mins:
        partial_aggs.append(F.min(c).alias(f"__min_{c}"))
        final_aggs.append(F.min(f"__min_{c}").alias(f"min_{c}"))
    for c in maxs:
        partial_aggs.append(F.max(c).alias(f"__max_{c}"))
        final_aggs.append(F.max(f"__max_{c}").alias(f"max_{c}"))
    if not partial_aggs:
        raise ValueError("Request at least one aggregate")
    salted = df.withColumn(SALT_COL, _content_salt(df, salts))
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
