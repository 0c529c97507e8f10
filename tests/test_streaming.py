"""Event windowing/sessionization — batch semantics plus real streaming
runs through a MemoryStream-equivalent (rate-free, deterministic) source."""

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from biomedical_data_integration_spark.streaming import (
    sessionize,
    streaming_materialize,
    streaming_tumbling_window_agg,
    tumbling_window_agg,
)


def _events(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions separated by a 60-min gap
        (1, "click", base, 1.0),
        (1, "click", base + dt.timedelta(minutes=10), 2.0),
        (1, "view", base + dt.timedelta(minutes=90), 3.0),
        # user 2: one session
        (2, "click", base + dt.timedelta(minutes=5), 4.0),
    ]
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts", "value"])


def test_tumbling_window_agg(spark):
    out = tumbling_window_agg(_events(spark), "1 hour")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    h0 = int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert got[(h0, "click")] == (3, 7.0)
    assert got[(h0 + 3600, "view")] == (1, 3.0)


def test_sessionize_gap_splits(spark):
    out = sessionize(_events(spark), gap_minutes=30)
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2  # the 80-min gap splits user 1
    assert len(per_user[2]) == 1
    s0, s1 = sorted(per_user[1], key=lambda r: r["session_start"])
    assert s0["n_events"] == 2 and s0["sum_value"] == 3.0
    assert s1["n_events"] == 1


def test_streaming_tumbling_matches_batch(spark):
    """The streaming face produces the same rows as the batch face when all
    data fits within the watermark (file source, one microbatch)."""
    events = _events(spark)
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        sq = (
            streaming_tumbling_window_agg(stream, "1 hour", watermark="10 hours")
            .writeStream.format("memory")
            .queryName("tumbling_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            tuple(r)
            for r in spark.sql("select * from tumbling_test").collect()
        }
    want = {tuple(r) for r in tumbling_window_agg(events, "1 hour").collect()}
    assert got == want


def test_streaming_materialize_is_stateless_projection(spark):
    events = _events(spark)
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = streaming_materialize(
            stream,
            [{"source": "event_type", "target": "kind",
              "matches": [("click", "CLICK"), ("view", "VIEW")]}],
        )
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("mat_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {r["kind"] for r in spark.sql("select * from mat_test").collect()}
    assert got == {"CLICK", "VIEW"}


def test_streaming_dedup_exact_across_microbatches(spark):
    """Duplicates are dropped across microbatches (state persists), the
    min-id row represents each content, and uniques all pass through."""
    from biomedical_data_integration_spark.streaming import streaming_dedup_exact

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        b1 = spark.createDataFrame(
            [(2, "same text"), (1, "same text"), (3, "unique one")],
            ["doc_id", "text"],
        )
        b2 = spark.createDataFrame(
            [(4, "same text"), (5, "unique two")], ["doc_id", "text"]
        )
        b1.coalesce(1).write.parquet(f"{src}/f1")
        b2.coalesce(1).write.parquet(f"{src}/f2")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        sq = (
            streaming_dedup_exact(stream)
            .writeStream.format("memory")
            .queryName("dedup_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            (r["doc_id"], r["text"])
            for r in spark.sql("select * from dedup_stream_test").collect()
        }
    # 'same text' emitted once with min id of its first-seen batch;
    # id 4 (later batch) must NOT appear
    assert (3, "unique one") in got and (5, "unique two") in got
    assert sum(1 for _, t in got if t == "same text") == 1
    assert (4, "same text") not in got
