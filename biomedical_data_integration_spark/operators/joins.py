"""Temporal joins — engine extensions beyond the reference's surface.

The reference has no join-like operator beyond similarity joins and
dictionary lookups (SURVEY §2.7); a training-data/event pipeline at scale
needs point-in-time enrichment ("the most recent feature value at event
time"). Spark has no native AS-OF join, so :func:`asof_join` builds one
from a union + one partitioned window — the single-shuffle formulation
that never expands pairs (a naive range theta-join explodes to
|left| x |right per key| before filtering; this plan carries each row
exactly once).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    value_cols: Optional[List[str]] = None,
    right_ts_alias: str = "asof_ts",
    tolerance_seconds: Optional[int] = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the value columns of the nearest
    right row per ``by`` key — ``direction='backward'`` (default) takes
    the latest right row with ``right.ts <= left.ts`` (DuckDB/pandas
    ``ASOF JOIN`` semantics), ``'forward'`` the earliest right row with
    ``right.ts >= left.ts`` (pandas ``merge_asof(direction='forward')``).
    Unmatched rows keep nulls. Both directions are inclusive at equal
    timestamps.

    Plan shape: tag both inputs, union, ONE window over
    ``partitionBy(by).orderBy(ts, side)`` carrying the last non-null right
    value forward (``last(..., ignorenulls=True)``), keep left rows. One
    shuffle keyed by ``by`` — the same shape as sessionization — and each
    input row is carried exactly once regardless of key density, which is
    what survives a 100x scale-up where a range join blows up.

    Determinism: right rows are first reduced to ONE row per (key, ts) by
    taking the lexicographically greatest value tuple — equal-timestamp
    ties would otherwise resolve by partition order. At equal timestamps
    the right row sorts BEFORE the left row, making the join inclusive.

    ``tolerance_seconds`` nulls out matches further away than the window
    (the pandas ``merge_asof(tolerance=...)`` knob, direction-aware).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, ts_col)]

    # deterministic dedup: one right row per (key, ts)
    packed = right.groupBy(*by, ts_col).agg(
        F.max(F.struct(*[F.col(c) for c in value_cols])).alias("__vals")
    )

    left_payload = [c for c in left.columns if c not in by and c != ts_col]
    r_types = dict(packed.select("__vals.*").dtypes)
    l_types = dict(left.dtypes)

    l_part = left.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        *[F.col(c) for c in left_payload],
        F.lit(1).alias("__side"),
        F.lit(None).cast(dict(left.dtypes)[ts_col]).alias("__rts"),
        *[F.lit(None).cast(r_types[c]).alias(f"__rv_{c}") for c in value_cols],
    )
    r_part = packed.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_payload],
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("__rts"),
        *[F.col(f"__vals.{c}").alias(f"__rv_{c}") for c in value_cols],
    )
    unioned = l_part.unionByName(r_part)

    if direction == "backward":
        # right (side 0) sorts BEFORE left at equal ts -> inclusive
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # forward: right sorts AFTER left at equal ts so the equal-ts
        # right row sits inside the left row's following frame
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col).asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = unioned.withColumns(
        {
            "__c_ts": carry("__rts"),
            **{f"__c_{c}": carry(f"__rv_{c}") for c in value_cols},
        }
    ).where(F.col("__side") == 1)

    if tolerance_seconds is not None:
        # Epoch-numeric ts columns must use raw arithmetic: unix_timestamp()
        # on a bigint parses it as a formatted string and yields null, which
        # would silently null out every match.
        ts_type = dict(left.dtypes)[ts_col]
        if ts_type.startswith("timestamp"):
            age = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
                F.col("__c_ts")
            )
        else:
            age = F.col(ts_col).cast("double") - F.col("__c_ts").cast("double")
        if direction == "forward":
            age = -age  # distance into the future
        fresh = age <= tolerance_seconds
        carried = carried.withColumns(
            {
                "__c_ts": F.when(fresh, F.col("__c_ts")),
                **{
                    f"__c_{c}": F.when(fresh, F.col(f"__c_{c}"))
                    for c in value_cols
                },
            }
        )

    return carried.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        *[F.col(c) for c in left_payload],
        F.col("__c_ts").alias(right_ts_alias),
        *[F.col(f"__c_{c}").alias(c) for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Range (interval-containment) join: each point row gains the interval
    row covering it per ``by`` key (``start <= ts <= end``, boundaries in
    epoch SECONDS; a timestamp ``ts_col`` is converted automatically).

    Scale shape: a naive theta join is |points| x |intervals per key|
    before filtering — a BroadcastNestedLoopJoin or worse at corpus scale.
    Here both sides are keyed by (by, time-bucket): each interval explodes
    to the buckets it touches (fan-out bounded by duration/bucket_seconds),
    each point hashes to its single bucket, and the join is an EQUI-join
    plus a residual range filter. Every (point, interval) pair meets in
    exactly one bucket (the point's), so no post-join dedup is needed.

    ``how='inner'`` keeps covered points; ``'left'`` keeps all points with
    null interval columns when uncovered. Points covered by overlapping
    intervals emit one row per covering interval.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    by = list(by)
    ts_type = dict(points.dtypes)[ts_col]
    tsec = (
        F.unix_timestamp(F.col(ts_col))
        if ts_type.startswith("timestamp")
        else F.col(ts_col).cast("bigint")
    )
    # Surrogate point id: the left-outer path needs point identity for its
    # coverage window and unmatched-dedup. Using the full point tuple would
    # (a) shuffle on a wide composite key and (b) collapse legitimately
    # duplicated point rows; a generated id keeps multiplicity and narrows
    # the window key to one long.
    p = (
        points.withColumn("__pid", F.monotonically_increasing_id())
        .withColumn("__tsec", tsec)
        .withColumn("__bucket", F.floor(F.col("__tsec") / bucket_seconds))
    )
    ivl_payload = [c for c in intervals.columns if c not in by]
    i = intervals.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(f"__i_{c}") for c in ivl_payload],
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_seconds),
                F.floor(F.col(end_col) / bucket_seconds),
            )
        ).alias("__bucket"),
    )
    joined = p.join(i, by + ["__bucket"], "left" if how == "left" else "inner")
    in_range = F.col("__tsec").between(
        F.col(f"__i_{start_col}"), F.col(f"__i_{end_col}")
    )
    if how == "inner":
        joined = joined.where(in_range)
    else:
        # left semantics: keep every in-range match; points with NO
        # in-range match keep exactly one row with null interval columns.
        # The split keeps overlapping-interval matches intact (a dedup on
        # point identity alone would drop one of two covering intervals);
        # identity is the surrogate __pid so exact-duplicate input points
        # each keep their own unmatched row.
        covered = F.coalesce(
            F.max(in_range.cast("int")).over(Window.partitionBy("__pid")),
            F.lit(0),
        )
        flagged = joined.withColumn("__cov", covered)
        matched = flagged.where(in_range)
        unmatched = (
            flagged.where(F.col("__cov") == 0)
            .withColumns(
                {f"__i_{c}": F.lit(None).cast(dict(i.dtypes)[f"__i_{c}"])
                 for c in ivl_payload}
            )
            .dropDuplicates(["__pid"])
        )
        joined = matched.unionByName(unmatched)
    return joined.select(
        *[F.col(c) for c in points.columns],
        *[F.col(f"__i_{c}").alias(c) for c in ivl_payload],
    )
