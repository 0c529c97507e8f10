"""Event-stream operators: tumbling windows and sessionization.

The reference is batch-only (SURVEY §1.1: no streaming anywhere), so this
module is an engine extension. Each operator has two faces with identical
semantics:

- a BATCH form (plain DataFrame in/out, oracle-checkable SQL), and
- a STREAMING form (same aggregation over ``readStream`` with watermarks),

because at 100 TB the events table is a stream in practice and the batch
form is its backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Per-window, per-group counts and value stats.

    Output keys the window by epoch seconds (bigint) so results hash
    identically across engines/timezones.
    """
    win = F.window(F.col(ts_col), window_duration)
    return (
        events.groupBy(win.alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization with an inactivity gap (lag + running sum).

    A session breaks when the gap to the previous event of the same user
    exceeds ``gap_minutes``. One shuffle (partition by user), then pure
    window functions. Output: (user_id, session_id, session_start,
    session_end, n_events, sum_value) with epoch-second timestamps.
    """
    w_user = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    with_breaks = events.withColumn(
        "__new_session",
        F.when(
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.lag(ts_col).over(w_user))
            > gap_s,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "__session_seq",
        F.sum("__new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_breaks.groupBy(user_col, "__session_seq")
        .agg(
            F.unix_timestamp(F.min(ts_col)).alias("session_start"),
            F.unix_timestamp(F.max(ts_col)).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .withColumnRenamed("__session_seq", "session_id")
    )


def streaming_tumbling_window_agg(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Streaming face of tumbling_window_agg: watermarked windowed agg.
    Late rows beyond the watermark are dropped; output mode 'update' or
    'append' per sink semantics."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` (native stateful
    session windows with the same inactivity-gap semantics as the batch
    ``sessionize``)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("w"),
            user_col,
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_materialize(stream: DataFrame, mapping_spec) -> DataFrame:
    """Harmonization on a stream: materialize_mapping is a stateless
    projection, so the same plan compiles onto a streaming DataFrame
    unchanged (small-dictionary mappers only — stream-stream joins would
    need watermarks)."""
    from biomedical_data_integration_spark.plans.spec import materialize_mapping

    return materialize_mapping(stream, mapping_spec)


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming exact dedup with custom managed state
    (``applyInPandasWithState``): the streaming face of
    ``operators.dedup.drop_exact_duplicates``.

    Rows are keyed by content hash; per-key state records whether a
    document with that content was already emitted, so duplicates are
    dropped *across* microbatches, not just within one. Within a batch
    the min ``id_col`` row wins (deterministic, matching the batch twin's
    min-id representative). Unlike stream ``dropDuplicates`` this exposes
    the state knobs a 100 TB ingest needs: ``state_ttl_minutes`` bounds
    state size by expiring content hashes not seen recently (processing-
    time TTL) — the standard trade for unbounded corpora where exact
    forever-dedup would hold one state row per distinct document.

    Output schema = input schema. State per key: one boolean.
    """
    import pandas as pd  # noqa: F401  (executor-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream.schema
    cols = [f.name for f in out_schema.fields]
    ttl_ms = None if state_ttl_minutes is None else state_ttl_minutes * 60_000

    def _dedup(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        batches = [pdf for pdf in pdf_iter if len(pdf)]
        if not state.exists and batches:
            allrows = pd.concat(batches, ignore_index=True)
            best = allrows.sort_values(id_col, kind="mergesort").head(1)
            state.update((True,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield best[cols]
        elif state.exists and ttl_ms is not None:
            # refresh the TTL on every sighting of the content
            state.setTimeoutDuration(ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    hashed = stream.withColumn("__h", F.md5(F.col(text_col).cast("string")))
    return hashed.groupBy("__h").applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )
