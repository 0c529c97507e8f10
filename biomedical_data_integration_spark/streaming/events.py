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


def streaming_minhash_lsh_candidates(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming near-duplicate CANDIDATE detection — the streaming face of
    the banded-MinHash stage of ``operators.dedup.minhash_lsh_pairs``.

    Per document the banded signature is computed entirely per-row
    (``minhash_band_keys``: no shuffle, bit-identical keys to the batch
    grouped path), exploded to (band, key) bucket entries, and each bucket
    keeps ONE state row: its first-seen representative id. Every later
    document landing in the bucket emits a candidate pair
    ``(id_a = representative, id_b = newcomer)`` — a star per bucket, whose
    transitive closure equals the batch candidate graph's components (feed
    the pairs to ``duplicate_clusters`` for keep/drop decisions).

    Exact-Jaccard verification is deliberately NOT done here: it needs the
    shingle sets of both documents, and holding full shingle sets in
    streaming state is exactly the unbounded-state design this engine
    avoids; verify candidates in a batch job over the candidate log (the
    batch twin shares the same keys, so backfill and stream agree).

    ``state_ttl_minutes`` bounds state for unbounded corpora by expiring
    buckets not seen recently (processing-time TTL), trading recall across
    long time gaps — the same knob as ``streaming_dedup_exact``.

    Output: (band int, key string, id_a, id_b) — id types follow
    ``id_col``. The same pair may re-emit if a document reappears;
    downstream ``distinct()``/clustering absorbs it.
    """
    import pandas as pd  # noqa: F401  (executor-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from biomedical_data_integration_spark.functions.strings import word_ngrams
    from biomedical_data_integration_spark.operators.dedup import (
        _tokens,
        minhash_band_keys,
    )

    id_sql_type = stream.schema[id_col].dataType.simpleString()
    out_schema = (
        f"band int, key string, id_a {id_sql_type}, id_b {id_sql_type}"
    )
    ttl_ms = None if state_ttl_minutes is None else state_ttl_minutes * 60_000

    # stage tokens, then shingles, in their own projections: each is
    # multiply-referenced downstream (num_perm transforms over __sh)
    staged = (
        stream.select(
            F.col(id_col).alias("__id"), _tokens(F.col(text_col)).alias("__toks")
        )
        .select("__id", word_ngrams(F.col("__toks"), shingle_words).alias("__sh"))
        .where(F.col("__sh").isNotNull())
    )
    entries = staged.select(
        "__id",
        F.explode(minhash_band_keys(F.col("__sh"), num_perm, bands)).alias("bk"),
    ).select(
        "__id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )

    def _candidates(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        ids: set = set()
        for pdf in pdf_iter:
            ids.update(pdf["__id"].tolist())
        if not ids:
            return
        ordered = sorted(ids)
        if state.exists:
            rep = state.get[0]
        else:
            rep = ordered[0]
            state.update((rep,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        pairs = [(int(key[0]), key[1], rep, i) for i in ordered if i != rep]
        if pairs:
            yield pd.DataFrame(pairs, columns=["band", "key", "id_a", "id_b"])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return entries.groupBy("band", "key").applyInPandasWithState(
        _candidates,
        outputStructType=out_schema,
        stateStructType=f"rep {id_sql_type}",
        outputMode="append",
        timeoutConf=timeout,
    )


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


def parse_event_props(
    events: DataFrame,
    fields: dict[str, str] | None = None,
    props_col: str = "props",
) -> DataFrame:
    """Extract typed fields from the JSON ``props`` payload column —
    semi-structured event enrichment (JSON stays a string at rest; typed
    columns materialize at query time via ``get_json_object``, which
    Catalyst collapses into one shared JSON parse per row when multiple
    paths are extracted).

    ``fields`` maps output column name -> "$.path:type"
    (default ``{"k": "$.k:int"}`` for the synthetic events table).
    Works identically on batch and streaming frames (stateless projection).
    """
    fields = fields or {"k": "$.k:int"}
    cols = [F.col(c) for c in events.columns]
    for out_name, spec in fields.items():
        path, _, typ = spec.partition(":")
        extracted = F.get_json_object(F.col(props_col), path)
        cols.append((extracted.cast(typ) if typ else extracted).alias(out_name))
    return events.select(*cols)


def hopping_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Overlapping (hopping) window counts/sums — each event lands in
    ``duration / slide`` windows (Spark's ``window(ts, dur, slide)``,
    epoch-aligned starts). Same output shape as ``tumbling_window_agg``;
    the tumbling form is the special case ``slide == duration``."""
    win = F.window(F.col(ts_col), window_duration, slide)
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


def streaming_hopping_window_agg(
    stream: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple = ("event_type",),
) -> DataFrame:
    """Streaming face of ``hopping_window_agg`` (watermarked)."""
    win = F.window(F.col(ts_col), window_duration, slide)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *group_cols)
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
