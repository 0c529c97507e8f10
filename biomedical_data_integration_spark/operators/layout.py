"""Multi-dimensional data layout: z-order (Morton) clustering keys.

Engine extension for the 100 TB story: parquet data skipping works off
per-file/row-group min-max statistics, which only prune on columns the
data is physically clustered by. Sorting by one column destroys
locality on the others; interleaving the BITS of several columns'
normalized bucket numbers (the z-order curve — what Delta's OPTIMIZE
ZORDER BY does) keeps every interleaved column's per-file span narrow,
so predicates on ANY of them prune files.

Everything is expression-level JVM code: one min-max aggregation over
the input (broadcast back as a 1-row cross join), then pure bit
arithmetic — no UDF, no shuffle beyond the final repartitionByRange.

Determinism: bucket quantization is ``floor`` on doubles derived from
exact min/max (no float summation anywhere), so keys are bit-identical
across engines and partitionings — the oracle replays them in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_KEY_BITS = 62  # stay inside a signed 64-bit key


MAX_QUANTILE_BITS = 10  # bucket lookup costs 2^bits comparisons/row/col


def zorder_key(
    df: DataFrame,
    cols: list,
    bits: int = 16,
    out_col: str = "z_key",
    boundaries: str = "minmax",
) -> DataFrame:
    """Append a bigint z-order key interleaving ``cols`` (numeric or
    timestamp). Per column the value maps to an integer bucket in
    [0, 2^bits), then bucket bits interleave round-robin (column j
    contributes bit i to key position i*n_cols + j). A NULL in any
    interleaved column yields key -1 (nulls cluster together at the
    front of the range).

    ``boundaries`` picks the bucketing:

    - ``'minmax'`` (default): linear
      ``floor((v - min) / (max - min) * (2^bits - 1) + 0.5)``. One tiny
      aggregation; right when values spread evenly. Under heavy skew
      most rows land in a few buckets and the skewed column stops
      pruning (the same failure Delta's linear ZORDER has).
    - ``'quantile'``: rank-based — per column the 2^bits - 1 type-1
      empirical quantiles (the ACTUAL data value at integer rank
      ``ceil(k*n / 2^bits)``, computed from a distinct-value cumulative
      frequency table with pure integer rank arithmetic — no float
      interpolation, so the boundaries are bit-identical across engines
      by construction; interpolated percentiles are NOT, their
      interpolation drifts an ulp around repeated values and can flip
      the >= bucket comparison) become the bucket boundaries, bucket =
      #boundaries <= v via an array aggregate over the broadcast
      boundary list. Near-equal-mass buckets, so skew cannot defeat
      pruning. Requires ``bits <= MAX_QUANTILE_BITS`` (lookup is 2^bits
      comparisons per row per column). The cum table is
      distinct-values-sized; its ordering window is the exact path's
      cost — the same two-phase bucketed split the distribution matcher
      uses is the documented cluster-scale substitute.

    One aggregation job computes all per-column stats; the bucket and
    interleave arithmetic is a single codegen'd projection.
    """
    if not cols or len(cols) < 1:
        raise ValueError("zorder_key: need at least one column")
    if bits < 1 or bits * len(cols) > MAX_KEY_BITS:
        raise ValueError(
            f"zorder_key: bits*len(cols) must be in [1, {MAX_KEY_BITS}] "
            f"(got {bits}*{len(cols)})"
        )
    if boundaries not in ("minmax", "quantile"):
        raise ValueError(f"zorder_key: unknown boundaries {boundaries!r}")
    if boundaries == "quantile" and bits > MAX_QUANTILE_BITS:
        raise ValueError(
            f"zorder_key: quantile boundaries support bits <= "
            f"{MAX_QUANTILE_BITS} (2^bits comparisons per row per column)"
        )
    n = len(cols)
    top = float((1 << bits) - 1)

    if boundaries == "minmax":
        stats = df.select(
            *[
                agg
                for c in cols
                for agg in (
                    F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
                )
            ]
        )

        def bucket(c: str):
            lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
            v = F.col(c).cast("double")
            frac = F.when(hi > lo, (v - lo) / (hi - lo)).otherwise(
                F.lit(0.0)
            )
            return F.floor(frac * top + F.lit(0.5)).cast("bigint")

    else:
        from .profiling import type1_boundaries

        stats = None
        for c in cols:
            b = type1_boundaries(df, c, 1 << bits).withColumnRenamed(
                "__boundaries", f"__bnd_{c}"
            )
            stats = b if stats is None else stats.crossJoin(b)

        def bucket(c: str):
            v = F.col(c).cast("double")
            return F.aggregate(
                F.col(f"__bnd_{c}"),
                F.lit(0).cast("bigint"),
                lambda acc, b: acc
                + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
            )

    # interleave: bit i of bucket_j lands at key bit i*n + j
    def interleaved():
        key = F.lit(0).cast("bigint")
        for j, c in enumerate(cols):
            b = F.col(f"__b_{c}")
            for i in range(bits):
                key = key.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(b, i).bitwiseAND(F.lit(1)),
                        i * n + j,
                    ).cast("bigint")
                )
        return key

    any_null = None
    for c in cols:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else (any_null | cond)

    staged = (
        df.crossJoin(F.broadcast(stats))
        .select("*", *[bucket(c).alias(f"__b_{c}") for c in cols])
    )
    out = staged.select(
        *df.columns,
        F.when(any_null, F.lit(-1).cast("bigint"))
        .otherwise(interleaved())
        .alias(out_col),
    )
    return out


def repartition_zorder(
    df: DataFrame,
    cols: list,
    n_partitions: int,
    bits: int = 16,
    out_col: str = "z_key",
    boundaries: str = "minmax",
) -> DataFrame:
    """Range-repartition by the z-order key (and sort within partitions
    by it): every interleaved column ends up with narrow per-partition
    min-max spans, which parquet writers turn into per-file statistics
    that prune on ANY of the clustered columns. ``boundaries='quantile'``
    keeps that true under skew (see :func:`zorder_key`)."""
    keyed = zorder_key(df, cols, bits=bits, out_col=out_col,
                       boundaries=boundaries)
    return keyed.repartitionByRange(n_partitions, F.col(out_col)) \
        .sortWithinPartitions(out_col)
