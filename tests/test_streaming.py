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


def test_streaming_minhash_band_keys_match_batch(spark):
    """The per-row banded signature used by the stream is bit-identical to
    the batch grouped-aggregation banding in minhash_lsh_pairs."""
    from biomedical_data_integration_spark.functions.strings import word_ngrams
    from biomedical_data_integration_spark.operators.dedup import (
        _signatures_from_shingles,
        _tokens,
        minhash_band_keys,
        shingle_sets,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc {i % 7} tail {i % 3}") for i in range(20)],
        ["doc_id", "text"],
    )
    # streaming-path keys (per-row)
    staged = docs.select(
        F.col("doc_id").alias("id"), _tokens(F.col("text")).alias("__toks")
    ).select("id", word_ngrams(F.col("__toks"), 3).alias("__sh"))
    row_keys = {
        (r["id"], r["bk"]["band"], r["bk"]["key"])
        for r in staged.select(
            "id", F.explode(minhash_band_keys(F.col("__sh"), 16, 4)).alias("bk")
        ).collect()
    }
    # batch-path keys (grouped signatures, as minhash_lsh_pairs builds them)
    sig = _signatures_from_shingles(shingle_sets(docs, "text", "doc_id", 3), 16)
    batch_keys = set()
    for r in sig.collect():
        for b in range(4):
            import hashlib
            chunk = "|".join(r["sig"][b * 4:(b + 1) * 4])
            batch_keys.add((r["id"], b, hashlib.md5(chunk.encode()).hexdigest()))
    assert row_keys == batch_keys


def test_streaming_minhash_lsh_candidates_across_microbatches(spark):
    """Near-dups across microbatches land in the same bucket and emit a
    candidate pair against the bucket's first-seen representative."""
    import tempfile

    from biomedical_data_integration_spark.streaming import (
        streaming_minhash_lsh_candidates,
    )

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        b1 = spark.createDataFrame(
            [(1, text_a), (7, "completely different content about spark engines")],
            ["doc_id", "text"],
        )
        b2 = spark.createDataFrame([(9, text_a)], ["doc_id", "text"])
        b1.coalesce(1).write.parquet(f"{src}/f1")
        b2.coalesce(1).write.parquet(f"{src}/f2")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        sq = (
            streaming_minhash_lsh_candidates(stream)
            .writeStream.format("memory")
            .queryName("mh_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        pairs = {
            (r["id_a"], r["id_b"])
            for r in spark.sql("select * from mh_stream_test").collect()
        }
    # identical docs 1 and 9 arrived in DIFFERENT microbatches: the state
    # representative (1) pairs with the newcomer (9) in every band
    assert pairs == {(1, 9)}


def test_parse_event_props_typed_extraction(spark):
    from biomedical_data_integration_spark.streaming.events import parse_event_props

    events = spark.createDataFrame(
        [(1, '{"k": 42, "tag": "a"}'), (2, '{"tag": "b"}'), (3, None)],
        ["event_id", "props"],
    )
    out = parse_event_props(
        events, {"k": "$.k:int", "tag": "$.tag:string"}
    )
    rows = {r["event_id"]: (r["k"], r["tag"]) for r in out.collect()}
    assert rows[1] == (42, "a")
    assert rows[2] == (None, "b")   # missing path -> null
    assert rows[3] == (None, None)  # null payload -> null
    assert out.columns == ["event_id", "props", "k", "tag"]


def test_parse_event_props_works_on_streams(spark):
    import tempfile

    from biomedical_data_integration_spark.streaming.events import parse_event_props

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        batch = spark.createDataFrame([(1, '{"k": 7}')], ["event_id", "props"])
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = parse_event_props(stream, {"k": "$.k:int"})
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory").queryName("props_test")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        sq.processAllAvailable()
        sq.stop()
        assert spark.sql("select k from props_test").collect()[0]["k"] == 7


def test_hopping_window_each_event_in_two_windows(spark):
    from biomedical_data_integration_spark.streaming import hopping_window_agg

    events = _events(spark)
    out = hopping_window_agg(events, "1 hour", "30 minutes")
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in out.collect()
    }
    h0 = int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # clicks at 00:00, 00:05, 00:10 land in windows starting 23:30 and 00:00
    assert got[(h0 - 1800, "click")] == 3
    assert got[(h0, "click")] == 3
    # total window memberships = 2 per event
    assert sum(got.values()) == 2 * events.count()


def test_streaming_hopping_matches_batch(spark):
    import tempfile

    from biomedical_data_integration_spark.streaming import (
        hopping_window_agg,
        streaming_hopping_window_agg,
    )

    events = _events(spark)
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        sq = (
            streaming_hopping_window_agg(stream, "1 hour", "30 minutes",
                                         watermark="10 hours")
            .writeStream.format("memory").queryName("hop_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt).start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {tuple(r) for r in spark.sql("select * from hop_test").collect()}
    want = {tuple(r) for r in hopping_window_agg(events, "1 hour", "30 minutes").collect()}
    assert got == want


def test_streaming_asof_join_matches_batch_across_microbatches(spark):
    """Same enrichment as the batch asof_join when data arrives in time
    order across two microbatches; state carries the last right value."""
    import datetime as dt
    import tempfile

    from biomedical_data_integration_spark.operators.joins import asof_join
    from biomedical_data_integration_spark.streaming import streaming_asof_join

    def ts(h, m=0):
        return dt.datetime(2026, 1, 1, h, m)

    # batch 1: early rows; batch 2: later rows whose matches live in batch 1
    l1 = [(1, ts(10), "a"), (2, ts(9), "c")]
    l2 = [(1, ts(12), "b"), (2, ts(13), "d")]
    r1 = [(1, ts(9, 30), 10.0), (1, ts(9, 30), 7.0)]  # equal-ts dup: max wins
    r2 = [(1, ts(12), 99.0), (2, ts(12, 30), 5.0)]

    left_all = spark.createDataFrame(l1 + l2, ["user_id", "ts", "tag"])
    right_all = spark.createDataFrame(r1 + r2, ["user_id", "ts", "v"])
    want = {tuple(r) for r in asof_join(left_all, right_all,
                                        value_cols=["v"]).collect()}

    with tempfile.TemporaryDirectory() as d:
        lsrc, rsrc, ckpt = f"{d}/l", f"{d}/r", f"{d}/ckpt"
        spark.createDataFrame(l1, ["user_id", "ts", "tag"]).coalesce(1)\
            .write.parquet(f"{lsrc}/b1")
        spark.createDataFrame(l2, ["user_id", "ts", "tag"]).coalesce(1)\
            .write.parquet(f"{lsrc}/b2")
        spark.createDataFrame(r1, ["user_id", "ts", "v"]).coalesce(1)\
            .write.parquet(f"{rsrc}/b1")
        spark.createDataFrame(r2, ["user_id", "ts", "v"]).coalesce(1)\
            .write.parquet(f"{rsrc}/b2")
        lstream = (spark.readStream.schema(left_all.schema)
                   .option("maxFilesPerTrigger", "1").parquet(f"{lsrc}/*"))
        rstream = (spark.readStream.schema(right_all.schema)
                   .option("maxFilesPerTrigger", "1").parquet(f"{rsrc}/*"))
        sq = (
            streaming_asof_join(lstream, rstream, value_cols=["v"])
            .writeStream.format("memory").queryName("asof_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt).start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {tuple(r)
               for r in spark.sql("select * from asof_stream_test").collect()}
    assert got == want


def test_streaming_interval_join_matches_batch(spark):
    """Native watermarked stream-stream range join produces the batch
    interval_join's inner result."""
    import tempfile

    from biomedical_data_integration_spark.operators.joins import interval_join
    from biomedical_data_integration_spark.streaming import (
        streaming_interval_join,
    )

    points = spark.createDataFrame(
        [(1, 100, "p1"), (1, 5000, "p2"), (2, 100, "p3"), (1, 2500, "p4")],
        ["user_id", "ts", "tag"],
    )
    intervals = spark.createDataFrame(
        [(1, 50, 200, "a"), (1, 90, 110, "b"), (2, 300, 400, "c"),
         (1, 100, 3900, "long")],
        ["user_id", "session_start", "session_end", "ivl"],
    )
    want = {tuple(r) for r in interval_join(points, intervals,
                                            bucket_seconds=1000).collect()}

    with tempfile.TemporaryDirectory() as d:
        psrc, isrc, ckpt = f"{d}/p", f"{d}/i", f"{d}/ckpt"
        points.coalesce(1).write.parquet(psrc)
        intervals.coalesce(1).write.parquet(isrc)
        pstream = spark.readStream.schema(points.schema).parquet(psrc)
        istream = spark.readStream.schema(intervals.schema).parquet(isrc)
        sq = (
            streaming_interval_join(pstream, istream, watermark="10 hours")
            .writeStream.format("memory").queryName("ivl_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt).start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {tuple(r)
               for r in spark.sql("select * from ivl_stream_test").collect()}
    assert got == want


def test_streaming_asof_join_tolerance(spark):
    import datetime as dt
    import tempfile

    from biomedical_data_integration_spark.streaming import streaming_asof_join

    def ts(h):
        return dt.datetime(2026, 1, 1, h)

    left = [(1, ts(12), "x"), (1, ts(13), "y")]
    right = [(1, ts(8), 1.0), (1, ts(12), 2.0)]
    with tempfile.TemporaryDirectory() as d:
        lsrc, rsrc, ckpt = f"{d}/l", f"{d}/r", f"{d}/ckpt"
        ldf = spark.createDataFrame(left, ["user_id", "ts", "tag"])
        rdf = spark.createDataFrame(right, ["user_id", "ts", "v"])
        ldf.coalesce(1).write.parquet(lsrc)
        rdf.coalesce(1).write.parquet(rsrc)
        sq = (
            streaming_asof_join(
                spark.readStream.schema(ldf.schema).parquet(lsrc),
                spark.readStream.schema(rdf.schema).parquet(rsrc),
                value_cols=["v"], tolerance_seconds=1800,
            )
            .writeStream.format("memory").queryName("asof_tol_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt).start()
        )
        sq.processAllAvailable()
        sq.stop()
        rows = {r["tag"]: (r["asof_ts"], r["v"])
                for r in spark.sql("select * from asof_tol_test").collect()}
    assert rows["x"] == (ts(12), 2.0)       # exact-ts match within tolerance
    assert rows["y"] == (None, None)        # 1h-old match rejected at 30min


def test_funnel_steps_order_matters(spark):
    from biomedical_data_integration_spark.streaming.events import (
        funnel_counts, funnel_steps,
    )

    rows = [
        # user 1 completes signup -> click -> purchase in order
        (1, "2024-01-01 00:00:00", "signup"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # user 2 purchases BEFORE clicking: purchase step must not count
        (2, "2024-01-01 00:00:00", "signup"),
        (2, "2024-01-01 02:00:00", "click"),
        (2, "2024-01-01 01:00:00", "purchase"),
        # user 3 never signs up
        (3, "2024-01-01 00:00:00", "click"),
        (3, "2024-01-01 01:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    steps = ["signup", "click", "purchase"]
    out = funnel_counts(df, steps).collect()[0]
    assert out["users_signup"] == 2
    assert out["users_click"] == 2
    assert out["users_purchase"] == 1
    per_user = {r["user_id"]: r for r in funnel_steps(df, steps).collect()}
    assert per_user[2]["step_purchase_ts"] is None
    assert per_user[3]["step_signup_ts"] is None


def test_funnel_steps_single_shuffle(spark):
    from biomedical_data_integration_spark.streaming.events import funnel_steps

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a")],
        "user_id bigint, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = funnel_steps(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    # the stacked windows + final agg must share ONE user_id exchange
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_retention_cohorts(spark):
    from biomedical_data_integration_spark.streaming.events import (
        retention_cohorts,
    )

    rows = [
        (1, "2024-01-01 00:00:00"),  # cohort week 0
        (1, "2024-01-09 00:00:00"),  # +1 period (7d)
        (2, "2024-01-02 00:00:00"),  # same cohort period as user 1
        (2, "2024-01-02 05:00:00"),  # same period -> one distinct row
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r["cohort_start"], r["period_offset"]): r["active_users"]
        for r in retention_cohorts(df).collect()
    }
    # both users active in their cohort period; user 1 returns next period
    assert out[("2023-12-28", 0)] == 2
    assert out[("2023-12-28", 1)] == 1


def test_streaming_funnel_matches_batch_across_microbatches(spark):
    import tempfile

    from biomedical_data_integration_spark.streaming.events import (
        funnel_steps,
        streaming_funnel_steps,
    )

    steps = ["signup", "click", "purchase"]
    rows1 = [
        (1, "2024-01-01 00:00:00", "signup"),
        (2, "2024-01-01 00:00:00", "signup"),
        (2, "2024-01-01 00:30:00", "purchase"),  # out of order -> ignored
    ]
    rows2 = [
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        (2, "2024-01-01 03:00:00", "click"),
    ]
    schema = "user_id bigint, ts string, event_type string"

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    batch_all = mk(rows1 + rows2)
    expected = {
        r["user_id"]: tuple(r[f"step_{s}_ts"] for s in steps)
        for r in funnel_steps(batch_all, steps).collect()
    }

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        mk(rows1).write.parquet(src)  # first microbatch
        stream = spark.readStream.schema(batch_all.schema).parquet(src)
        out = streaming_funnel_steps(stream, steps)
        sq = (
            out.writeStream.format("memory")
            .queryName("funnel_stream")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        mk(rows2).write.mode("append").parquet(src)  # second microbatch
        sq.processAllAvailable()
        sq.stop()
        # keep each user's LAST emitted frontier
        rows = spark.sql(
            "select * from funnel_stream"
        ).collect()
    # frontiers only ever gain steps, so "latest" = most complete
    # (order-independent: memory-sink row order is not contractual)
    latest = {}
    for r in rows:
        tup = tuple(r[f"step_{s}_ts"] for s in steps)
        prev = latest.get(r["user_id"])
        if prev is None or sum(t is not None for t in tup) > sum(
            t is not None for t in prev
        ):
            latest[r["user_id"]] = tup
    assert latest == expected
    # user 2's early purchase (before click) must NOT count
    assert latest[2][2] is None


def test_event_rate_anomalies_flags_spike(spark):
    from biomedical_data_integration_spark.streaming.events import (
        event_rate_anomalies,
    )

    rows = []
    # 10 quiet hours of 2 events, one spike hour of 40
    for h in range(10):
        for i in range(2):
            rows.append((h * 100 + i, f"2024-01-01 {h:02d}:00:0{i}", "click"))
    for i in range(40):
        rows.append((9000 + i, "2024-01-01 12:00:01", "click"))
    df = spark.createDataFrame(rows, "event_id bigint, ts string, event_type string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = event_rate_anomalies(df)
    spikes = [r for r in out.collect() if r["is_anomaly"]]
    assert len(spikes) == 1
    assert spikes[0]["n_events"] == 40
    quiet = [r for r in out.collect() if not r["is_anomaly"]]
    assert all(r["n_events"] == 2 for r in quiet)


# ---------------------------------------------------------------------------
# property-based equivalence: funnel_steps vs a per-user pandas replay
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_fevent = st.tuples(
    st.integers(min_value=0, max_value=3),   # user
    st.integers(min_value=0, max_value=40),  # epoch-second ts
    st.sampled_from(["a", "b", "c", "x"]),   # event type (x = noise)
)


def _replay_funnel(rows, steps):
    """Reference semantics, computed independently: step i's first ts
    strictly after step i-1's first qualifying ts."""
    out = {}
    by_user = {}
    for u, t, e in rows:
        by_user.setdefault(u, []).append((t, e))
    for u, evs in by_user.items():
        prev = None
        got = []
        for step in steps:
            cands = [
                t for t, e in evs
                if e == step and (prev is None or t > prev)
            ] if (prev is not None or step == steps[0]) else []
            cur = min(cands) if cands else None
            got.append(cur)
            prev = cur
            if cur is None:
                # later steps can never qualify
                got.extend([None] * (len(steps) - len(got)))
                break
        out[u] = tuple(got)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_fevent, min_size=1, max_size=40))
def test_funnel_steps_matches_replay(spark, rows):
    from biomedical_data_integration_spark.streaming.events import funnel_steps

    steps = ["a", "b", "c"]
    df = spark.createDataFrame(
        [(u, t, e) for u, t, e in rows], "user_id bigint, ts bigint, event_type string"
    )
    got = {
        r["user_id"]: tuple(r[f"step_{s}_ts"] for s in steps)
        for r in funnel_steps(df, steps).collect()
    }
    assert got == _replay_funnel(rows, steps)


def test_hypertable_rollup_single_raw_scan_and_exactness(spark):
    from biomedical_data_integration_spark.streaming.events import (
        hypertable_rollup,
    )

    rows = [
        (1, "2024-01-01 00:10:00", 1.0),
        (2, "2024-01-01 00:50:00", 2.0),
        (3, "2024-01-01 01:10:00", 4.0),
        (4, "2024-01-02 05:00:00", 8.0),
    ]
    df = spark.createDataFrame(rows, "id bigint, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = hypertable_rollup(df, grains=(3600, 86400))
    got = {
        (r["grain_seconds"], r["window_start"]):
            (r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
        for r in out.collect()
    }
    day0 = 1704067200  # 2024-01-01 UTC
    assert got[(3600, day0)] == (2, 3.0, 1.0, 2.0)
    assert got[(3600, day0 + 3600)] == (1, 4.0, 4.0, 4.0)
    assert got[(86400, day0)] == (3, 7.0, 1.0, 4.0)
    assert got[(86400, day0 + 86400)] == (1, 8.0, 8.0, 8.0)
    # raw table is scanned exactly once (no per-grain union branches);
    # AQE's toString also prints the Initial Plan — inspect the final only
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1


def test_hypertable_rollup_rejects_non_multiple_grain(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.streaming.events import (
        hypertable_rollup,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "id bigint, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pytest.raises(ValueError, match="multiple"):
        hypertable_rollup(df, grains=(3600, 5000))


def test_rollup_merge_equals_full_recompute(spark):
    from biomedical_data_integration_spark.streaming.events import (
        hypertable_rollup,
        rollup_merge,
    )

    schema = "id bigint, ts string, value double"
    old = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1.5), (2, "2024-01-01 05:00:00", 2.5)],
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    new = spark.createDataFrame(
        [(3, "2024-01-01 00:40:00", 4.0), (4, "2024-01-03 09:00:00", 8.0)],
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    grains = (3600, 86400)
    merged = rollup_merge(
        hypertable_rollup(old, grains=grains, round_output=False),
        hypertable_rollup(new, grains=grains, round_output=False),
    )
    full = hypertable_rollup(old.unionByName(new), grains=grains)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_rollup_merge_schema_validation(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.streaming.events import rollup_merge

    bad = spark.createDataFrame([(1,)], "x bigint")
    with _pytest.raises(ValueError, match="missing"):
        rollup_merge(bad, bad)


def test_streaming_rate_anomalies_matches_batch(spark):
    import tempfile

    from biomedical_data_integration_spark.streaming.events import (
        event_rate_anomalies,
        rate_stats,
        streaming_rate_anomalies,
    )

    rows = []
    for h in range(8):
        for i in range(3):
            rows.append((h * 100 + i, f"2024-01-01 {h:02d}:00:0{i}", "click"))
    for i in range(30):
        rows.append((9000 + i, "2024-01-01 10:00:01", "click"))
    batch = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    stats = rate_stats(batch)
    want = {
        (r["event_type"], r["window_start"]): (r["n_events"], r["z"], r["is_anomaly"])
        for r in event_rate_anomalies(batch).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = streaming_rate_anomalies(stream, stats, watermark="100 hours")
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("rate_anom_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            (r["event_type"], r["window_start"]): (r["n_events"], r["z"], r["is_anomaly"])
            for r in spark.sql("select * from rate_anom_test").collect()
        }
    assert got == want
    assert any(v[2] for v in got.values())  # the spike is flagged


def test_streaming_funnel_numeric_ts_and_generic_user(spark):
    """The streaming twin must accept the same shapes as the batch face:
    plain numeric epoch ts and non-long user ids."""
    import tempfile

    from biomedical_data_integration_spark.streaming.events import (
        funnel_steps,
        streaming_funnel_steps,
    )

    steps = ["a", "b"]
    rows = [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 5, "b")]
    batch = spark.createDataFrame(
        rows, "user_id string, ts bigint, event_type string"
    )
    expected = {
        r["user_id"]: (r["step_a_ts"], r["step_b_ts"])
        for r in funnel_steps(batch, steps).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        sq = (
            streaming_funnel_steps(stream, steps)
            .writeStream.format("memory")
            .queryName("funnel_generic")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            r["user_id"]: (r["step_a_ts"], r["step_b_ts"])
            for r in spark.sql("select * from funnel_generic").collect()
        }
    assert got == expected
    assert got["u1"] == (10, 20) and got["u2"] == (None, None)


def test_streaming_hypertable_base_feeds_rollup_merge(spark):
    import tempfile

    from biomedical_data_integration_spark.streaming.events import (
        hypertable_rollup,
        rollup_merge,
        streaming_hypertable_base,
    )

    schema = "id bigint, ts string, value double"
    batch = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 1.5),
            (2, "2024-01-01 00:40:00", 2.5),
            (3, "2024-01-01 03:00:00", 4.0),
        ],
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        sq = (
            streaming_hypertable_base(stream, watermark="100 hours")
            .writeStream.format("memory")
            .queryName("ht_base")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        base = spark.sql("select * from ht_base")
        # stream-maintained finest grain == batch finest grain (unrounded)
        want = sorted(
            map(tuple, hypertable_rollup(
                batch, grains=(3600,), round_output=False
            ).collect())
        )
        assert sorted(map(tuple, base.collect())) == want
        # and it merges into a materialized rollup like any delta
        merged = rollup_merge(base, base)
        row = merged.where(F.col("window_start") == 1704067200).collect()[0]
        assert row["n_events"] == 4 and row["sum_value"] == 8.0


def _state_rows(sq):
    """numRowsTotal from the most recent progress with a state operator."""
    for prog in reversed(sq.recentProgress):
        ops = prog.get("stateOperators") or []
        if ops:
            return ops[0]["numRowsTotal"]
    return None


def _stop_and_settle(sq, settle_s=1.0):
    """Stop a stateful query and wait for its checkpoint writers to
    finish: sq.stop() returns while state/commit files may still be
    flushing, and TemporaryDirectory cleanup then races the writer
    (observed as rmtree 'directory not empty' flakes). awaitTermination
    + a short settle closes the window."""
    import time

    sq.stop()
    try:
        sq.awaitTermination(30)
    except Exception:
        pass
    time.sleep(settle_s)


def _wait_for_state(sq, pred, deadline_s=240):
    """Poll progress until the state row count satisfies pred.

    TTL tests use a ~9 s TTL (0.15 min): shorter TTLs can expire state
    BEFORE the poller ever observes the full plateau on a loaded host,
    making the plateau assertion racy.

    With ProcessingTimeTimeout the engine schedules no-data micro-batches
    to fire timeouts, so ``processAllAvailable`` never settles — polling
    the progress stream is the supported observation point (and lets the
    tests show TTL expiry firing WITHOUT new input arriving).
    """
    import time

    t0 = time.time()
    while time.time() - t0 < deadline_s:
        n = _state_rows(sq)
        if n is not None and pred(n):
            return n
        time.sleep(0.5)
    raise AssertionError(f"state rows never satisfied predicate; last={_state_rows(sq)}")


def test_streaming_dedup_exact_state_plateaus_under_ttl(spark):
    """State-size discipline: content hashes idle past the TTL are
    REMOVED when the timeout fires (on the engine's no-data batches), so
    state plateaus instead of growing one row per distinct document
    forever. An expired content re-emits on return — the documented
    recall trade."""
    from biomedical_data_integration_spark.streaming import streaming_dedup_exact

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        schema = "doc_id bigint, text string"
        b1 = spark.createDataFrame([(i, f"doc {i}") for i in range(6)], schema)
        b1.coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        sq = (
            streaming_dedup_exact(stream, state_ttl_minutes=0.15)  # 9 s
            .writeStream.format("memory")
            .queryName("dedup_ttl_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            _wait_for_state(sq, lambda n: n == 6)  # one row per content
            # TTL fires with NO new input: state drains back to zero
            _wait_for_state(sq, lambda n: n == 0)
            # a returning expired content re-emits; fresh state accrues
            b2 = spark.createDataFrame(
                [(100, "doc 0"), (101, "brand new")], schema
            )
            b2.coalesce(1).write.parquet(f"{src}/f2")
            _wait_for_state(sq, lambda n: n >= 2)
            got = {
                r["doc_id"]
                for r in spark.sql("select * from dedup_ttl_test").collect()
            }
        finally:
            _stop_and_settle(sq)
    assert 100 in got and 101 in got  # expired 'doc 0' re-emitted as 100


def test_streaming_funnel_state_expires_idle_users(spark):
    import datetime as dt

    from biomedical_data_integration_spark.streaming.events import (
        streaming_funnel_steps,
    )

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        schema = "user_id bigint, event_type string, ts timestamp"
        b1 = spark.createDataFrame(
            [(u, "signup", base) for u in range(5)], schema
        )
        b1.coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        sq = (
            streaming_funnel_steps(
                stream, ["signup", "purchase"], state_ttl_minutes=0.15
            )
            .writeStream.format("memory")
            .queryName("funnel_ttl_test")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            # generous deadlines: TTL firing rides the engine's no-data
            # micro-batches, whose scheduling lags badly on a loaded
            # host (observed flaking at 90 s under a parallel full run)
            _wait_for_state(sq, lambda n: n == 5, 180)  # one frontier/user
            _wait_for_state(sq, lambda n: n == 0, 240)  # idle -> expired
            b2 = spark.createDataFrame(
                [(0, "purchase", base + dt.timedelta(minutes=1))], schema
            )
            b2.coalesce(1).write.parquet(f"{src}/f2")
            _wait_for_state(sq, lambda n: n == 1, 240)  # only user 0 rebuilt
            u0 = [
                r
                for r in spark.sql("select * from funnel_ttl_test").collect()
                if r["user_id"] == 0
            ]
        finally:
            _stop_and_settle(sq)
    # user 0's funnel RESTARTED after expiry: the purchase arrives with no
    # live signup step, so step 2 never completes (documented recall trade)
    assert u0 and all(r["step_purchase_ts"] is None for r in u0)


def test_streaming_lsh_candidates_state_plateaus_under_ttl(spark):
    from biomedical_data_integration_spark.streaming import (
        streaming_minhash_lsh_candidates,
    )

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        schema = "doc_id bigint, text string"
        texts = [
            (i, f"totally distinct document number {i} with words {i * 7}")
            for i in range(4)
        ]
        spark.createDataFrame(texts, schema).coalesce(1).write.parquet(
            f"{src}/f1"
        )
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        sq = (
            streaming_minhash_lsh_candidates(stream, state_ttl_minutes=0.15)
            .writeStream.format("memory")
            .queryName("lsh_ttl_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            # one state row per (band, key) bucket
            before = _wait_for_state(sq, lambda n: n > 0)
            _wait_for_state(sq, lambda n: n == 0)  # buckets expire when idle
            spark.createDataFrame(
                [(50, "a single fresh unseen document")], schema
            ).coalesce(1).write.parquet(f"{src}/f2")
            after = _wait_for_state(sq, lambda n: n > 0)
        finally:
            _stop_and_settle(sq)
    # only the fresh doc's buckets remain — far fewer than 4 docs' worth
    assert after < before


def _gapfill_df(spark):
    # hourly buckets with a 2-hour hole inside 'a' and a single bucket 'b'
    rows = [
        (1, "2024-01-01 00:10:00", "a", 10.0),
        (2, "2024-01-01 00:40:00", "a", 12.0),
        (3, "2024-01-01 03:10:00", "a", 40.0),
        (4, "2024-01-01 01:30:00", "b", 5.0),
    ]
    return spark.createDataFrame(
        rows, "id bigint, ts string, g string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_gapfill_locf_and_linear(spark):
    from biomedical_data_integration_spark.streaming.events import gapfill

    df = _gapfill_df(spark)
    t0 = 1704067200  # 2024-01-01 00:00 UTC

    locf = {
        (r["g"], r["bucket_start"]): (r["n_events"], r["value_filled"],
                                      r["observed"])
        for r in gapfill(df, 3600, group_cols=("g",), fill="locf").collect()
    }
    # grid spans the GLOBAL [min,max] bucket range for every group
    assert sorted(b for (g, b) in locf if g == "b") == [
        t0, t0 + 3600, t0 + 7200, t0 + 10800
    ]
    assert locf[("a", t0)] == (2, 11.0, 1)          # observed avg
    assert locf[("a", t0 + 3600)] == (0, 11.0, 0)   # carried forward
    assert locf[("a", t0 + 7200)] == (0, 11.0, 0)
    assert locf[("a", t0 + 10800)] == (1, 40.0, 1)
    assert locf[("b", t0)][1] is None               # nothing to carry yet
    assert locf[("b", t0 + 3600)] == (1, 5.0, 1)

    lin = {
        (r["g"], r["bucket_start"]): r["value_filled"]
        for r in gapfill(df, 3600, group_cols=("g",), fill="linear").collect()
    }
    # 11 -> 40 across 3 hourly steps: 11, 20.6667, 30.3333, 40
    assert lin[("a", t0 + 3600)] == 20.6667
    assert lin[("a", t0 + 7200)] == 30.3333
    # edges fall back one-sided (nocb before the first observation)
    assert lin[("b", t0)] == 5.0
    assert lin[("b", t0 + 10800)] == 5.0


def test_gapfill_none_mode_and_explicit_range(spark):
    from biomedical_data_integration_spark.streaming.events import gapfill

    df = _gapfill_df(spark)
    t0 = 1704067200
    out = {
        (r["g"], r["bucket_start"]): r["value_filled"]
        for r in gapfill(
            df, 3600, group_cols=("g",), fill="none",
            start=t0, end=t0 + 5 * 3600,
        ).collect()
    }
    # explicit range extends the grid beyond the data
    assert ("a", t0 + 4 * 3600) in out and ("a", t0 + 5 * 3600) in out
    assert out[("a", t0 + 3600)] is None
    assert out[("b", t0 + 3600)] == 5.0


def test_gapfill_rejects_bad_args(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.streaming.events import gapfill

    df = _gapfill_df(spark)
    with _pytest.raises(ValueError, match="fill"):
        gapfill(df, 3600, fill="spline")
    with _pytest.raises(ValueError, match="positive"):
        gapfill(df, 0)


def test_gapfill_single_raw_scan(spark):
    from biomedical_data_integration_spark.streaming.events import gapfill

    df = _gapfill_df(spark)
    out = gapfill(df, 3600, group_cols=("g",), fill="linear")
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # raw rows feed ONE aggregation; grid/range/windows reuse the bucket
    # aggregate via the exchange — the raw RDD itself is scanned once per
    # consumer of `observed` (bucket agg), not once per fill window
    assert final.count("CartesianProduct") == 0


def _attr_df(spark):
    rows = [
        # user 1: click -> view -> purchase -> purchase (2nd has same ts
        # as a later click: tie broken by event_id)
        (1, 10, "2024-01-01 00:00:00", "click", 0.0),
        (2, 10, "2024-01-01 00:10:00", "view", 0.0),
        (3, 10, "2024-01-01 00:20:00", "purchase", 9.0),
        (4, 10, "2024-01-01 00:30:00", "click", 0.0),
        (5, 10, "2024-01-01 00:30:00", "purchase", 7.0),  # same ts as 4
        # user 2: purchase with NO preceding touch
        (6, 20, "2024-01-01 01:00:00", "purchase", 5.0),
        # user 3: touches only, no conversion
        (7, 30, "2024-01-01 02:00:00", "view", 0.0),
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, "
              "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_attribution_last_and_first_touch(spark):
    from biomedical_data_integration_spark.streaming.events import (
        attribute_conversions,
    )

    df = _attr_df(spark)
    last = {
        r["event_id"]: (r["touch_event_id"], r["touch_type"])
        for r in attribute_conversions(df, model="last_touch").collect()
    }
    # purchase 3 <- view 2 (most recent); purchase 5 <- click 4 (same ts,
    # lower event_id sorts first => already seen); purchase 6 unattributed
    assert last == {3: (2, "view"), 5: (4, "click"), 6: (None, None)}

    first = {
        r["event_id"]: r["touch_event_id"]
        for r in attribute_conversions(df, model="first_touch").collect()
    }
    assert first == {3: 1, 5: 1, 6: None}


def test_attribution_rejects_unknown_model(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.streaming.events import (
        attribute_conversions,
    )

    with _pytest.raises(ValueError, match="model"):
        attribute_conversions(_attr_df(spark), model="linear")


def test_event_transition_matrix(spark):
    from biomedical_data_integration_spark.streaming.events import (
        event_transition_matrix,
    )

    df = _attr_df(spark)
    out = {
        (r["src_type"], r["dst_type"]): (r["n_transitions"], r["p"])
        for r in event_transition_matrix(df).collect()
    }
    # user 1 sequence: click,view,purchase,click,purchase
    # transitions: c->v, v->p, p->c, c->p ; users 2,3 contribute none
    assert out[("click", "view")] == (1, 0.5)
    assert out[("click", "purchase")] == (1, 0.5)
    assert out[("view", "purchase")] == (1, 1.0)
    assert out[("purchase", "click")] == (1, 1.0)
    # row-stochastic: per-source probabilities sum to 1
    sums = {}
    for (s, _d), (_n, p) in out.items():
        sums[s] = sums.get(s, 0.0) + p
    assert all(abs(v - 1.0) < 1e-9 for v in sums.values())


def test_streaming_attribution_matches_batch_across_microbatches(spark):
    """Attribution over two microbatches equals the batch twin when a
    conversion's touch lives in the previous batch (frontier state)."""
    import tempfile

    from biomedical_data_integration_spark.streaming import (
        streaming_attribute_conversions,
    )
    from biomedical_data_integration_spark.streaming.events import (
        attribute_conversions,
    )

    b1 = [
        (1, 10, "2024-01-01 00:00:00", "click", 0.0),
        (2, 10, "2024-01-01 00:10:00", "purchase", 9.0),
        (3, 20, "2024-01-01 00:20:00", "view", 0.0),
    ]
    b2 = [
        (4, 20, "2024-01-01 01:00:00", "purchase", 5.0),  # touch in b1
        (5, 30, "2024-01-01 01:10:00", "purchase", 2.0),  # never touched
    ]
    schema = ("event_id bigint, user_id bigint, ts string, "
              "event_type string, value double")

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    want = {
        (r["event_id"], r["touch_event_id"], r["touch_type"])
        for r in attribute_conversions(mk(b1 + b2)).collect()
    }

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        mk(b1).coalesce(1).write.parquet(f"{src}/b1")
        mk(b2).coalesce(1).write.parquet(f"{src}/b2")
        stream = (
            spark.readStream.schema(mk(b1).schema)
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        )
        sq = (
            streaming_attribute_conversions(stream)
            .writeStream.format("memory").queryName("attr_stream_test")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        sq.awaitTermination(120)
        got = {
            (r["event_id"], r["touch_event_id"], r["touch_type"])
            for r in spark.sql(
                "SELECT * FROM attr_stream_test"
            ).collect()
        }
    assert got == want
    assert (5, None, None) in got  # unattributed conversion still emits


def test_streaming_transition_counts_merge_to_batch_matrix(spark):
    """Summed per-batch deltas equal the batch transition counts, even
    when a user's sequence spans the batch boundary."""
    import tempfile

    from biomedical_data_integration_spark.streaming import (
        streaming_transition_counts,
    )
    from biomedical_data_integration_spark.streaming.events import (
        event_transition_matrix,
    )

    b1 = [
        (1, 10, "2024-01-01 00:00:00", "click", 0.0),
        (2, 10, "2024-01-01 00:10:00", "view", 0.0),
    ]
    b2 = [
        (3, 10, "2024-01-01 00:20:00", "purchase", 1.0),  # view->purchase
        (4, 20, "2024-01-01 00:30:00", "signup", 0.0),
    ]
    schema = ("event_id bigint, user_id bigint, ts string, "
              "event_type string, value double")

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    want = {
        (r["src_type"], r["dst_type"]): r["n_transitions"]
        for r in event_transition_matrix(mk(b1 + b2)).collect()
    }

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        mk(b1).coalesce(1).write.parquet(f"{src}/b1")
        mk(b2).coalesce(1).write.parquet(f"{src}/b2")
        stream = (
            spark.readStream.schema(mk(b1).schema)
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        )
        sq = (
            streaming_transition_counts(stream)
            .writeStream.format("memory").queryName("trans_stream_test")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        sq.awaitTermination(120)
        got = {}
        for r in spark.sql("SELECT * FROM trans_stream_test").collect():
            k = (r["src_type"], r["dst_type"])
            got[k] = got.get(k, 0) + r["n_transitions"]
    # deltas merge by summation to the batch counts (no probabilities
    # in the stream face — normalize at read time)
    assert got == want


def test_streaming_attribution_state_plateaus_under_ttl(spark):
    """State-size discipline for the attribution frontier: one row per
    user, and idle users expire when the TTL fires (no-data batches), so
    state plateaus instead of growing with the user space forever."""
    import tempfile as _tempfile

    from biomedical_data_integration_spark.streaming import (
        streaming_attribute_conversions,
    )

    with _tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        schema = ("event_id bigint, user_id bigint, ts string, "
                  "event_type string, value double")
        rows = [(i, i, "2024-01-01 00:00:00", "click", 0.0)
                for i in range(8)]
        b1 = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        b1.coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        )
        sq = (
            streaming_attribute_conversions(
                stream, state_ttl_minutes=0.15  # 9 s
            )
            .writeStream.format("memory").queryName("attr_ttl_test")
            .outputMode("append").option("checkpointLocation", ckpt)
            .start()
        )
        try:
            _wait_for_state(sq, lambda n: n == 8, 180)  # one row per user
            _wait_for_state(sq, lambda n: n == 0, 240)  # TTL drains all
        finally:
            _stop_and_settle(sq)


def test_seasonal_naive_eval_golden(spark):
    from biomedical_data_integration_spark.streaming.events import (
        seasonal_naive_eval,
    )

    # 8 hourly buckets, season = 4: hours 4-7 forecast from hours 0-3,
    # actuals shifted by a constant +1
    rows = [
        (h, f"2024-01-01 0{h}:00:00", "a",
         10.0 * h if h < 4 else 10.0 * (h - 4) + 1.0)
        for h in range(8)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = seasonal_naive_eval(df, season_buckets=4, bucket_seconds=3600)
    r = out.collect()[0]
    assert r["n_buckets"] == 8 and r["n_forecast"] == 4
    assert r["n_unforecast"] == 4      # the first season has no ancestor
    assert r["mae"] == 1.0             # constant +1 shift


def test_seasonal_naive_eval_gap_misalignment_excluded(spark):
    from biomedical_data_integration_spark.streaming.events import (
        seasonal_naive_eval,
    )

    # bucket sequence with a HOLE: the ancestor lookup is exact bucket
    # arithmetic, so 03:00 still finds its true 2h-ago ancestor (01:00)
    # while 04:00 (whose ancestor 02:00 is missing) stays unforecast —
    # a positional lag would have gotten BOTH wrong
    rows = [
        (1, "2024-01-01 00:00:00", "a", 1.0),
        (2, "2024-01-01 01:00:00", "a", 2.0),
        # 02:00 missing
        (3, "2024-01-01 03:00:00", "a", 3.0),
        (4, "2024-01-01 04:00:00", "a", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = seasonal_naive_eval(df, season_buckets=2, bucket_seconds=3600)
    r = out.collect()[0]
    assert r["n_forecast"] == 1 and r["n_unforecast"] == 3
    assert r["mae"] == 1.0  # |2 - 3|


def test_m4_downsample_golden(spark):
    from biomedical_data_integration_spark.streaming.events import (
        m4_downsample,
    )

    # one group, 1 bucket: min/max/first/last are distinct known points
    rows = [
        (1, "2024-01-01 00:00:00", "a", 5.0),   # first
        (2, "2024-01-01 00:10:00", "a", 1.0),   # min
        (3, "2024-01-01 00:20:00", "a", 9.0),   # max
        (4, "2024-01-01 00:30:00", "a", 4.0),   # last
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["role"]: (r["epoch"], r["value"])
        for r in m4_downsample(df, n_buckets=1).collect()
    }
    t0 = 1704067200
    assert got["first"] == (t0, 5.0)
    assert got["min"] == (t0 + 600, 1.0)
    assert got["max"] == (t0 + 1200, 9.0)
    assert got["last"] == (t0 + 1800, 4.0)


def test_m4_downsample_bounded_output_and_envelope(spark):
    from biomedical_data_integration_spark.streaming.events import (
        m4_downsample,
    )

    rows = [
        (i, f"2024-01-01 {i % 24:02d}:{(i * 7) % 60:02d}:00", "a",
         float((i * 31) % 100))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = m4_downsample(df, n_buckets=10).collect()
    # bounded: at most 4 rows per (group, bucket)
    assert len(out) <= 4 * 10
    # envelope: per-bucket min/max rows bracket every value in the bucket
    import collections
    roles = collections.defaultdict(dict)
    for r in out:
        roles[r["bucket"]][r["role"]] = r["value"]
    for b, rr in roles.items():
        assert rr["min"] <= rr["first"] <= rr["max"]
        assert rr["min"] <= rr["last"] <= rr["max"]


def test_streaming_dsir_score_matches_batch(spark):
    """Fit-batch/serve-stream parity for the DSIR gate: the streaming
    projection over literal bucket ratios reproduces dsir_weights'
    (n_tokens, log_weight, avg_log_ratio) row-for-row on an in-order
    replay of the raw corpus — the selection capstone's ingest twin."""
    from biomedical_data_integration_spark.operators.sampling import (
        dsir_bucket_ratios,
        dsir_weights,
    )
    from biomedical_data_integration_spark.streaming import (
        streaming_dsir_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = docs.where("doc_id % 3 != 0").select("doc_id", "text")
    target = docs.where("doc_id % 3 = 0").select("doc_id", "text")
    nb = 256
    want = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"], r["avg_log_ratio"])
        for r in dsir_weights(raw, target, n_buckets=nb).collect()
    }
    ratios = dsir_bucket_ratios(raw, target, n_buckets=nb)
    assert len(ratios) == nb and all(isinstance(v, int) for v in ratios)

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        raw.write.parquet(src)
        stream = spark.readStream.schema(raw.schema).parquet(src)
        out = streaming_dsir_score(stream, ratios)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("dsir_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            r["doc_id"]: (r["n_tokens"], r["log_weight"], r["avg_log_ratio"])
            for r in spark.sql("select * from dsir_stream_test").collect()
        }
        # the projection is stateless: no aggregation/join in the plan
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in plan and "Join" not in plan
    assert got == want


def test_streaming_quality_score_matches_batch(spark):
    """The trained quality filter serves on a stream bit-for-bit equal
    to the batch face — train on batch, gate the firehose."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        score_quality_classifier,
        train_quality_classifier,
    )
    from biomedical_data_integration_spark.streaming import (
        streaming_quality_score,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    model = train_quality_classifier(
        docs, (F.col("quality_score") >= 0.66).cast("int"), iters=3, lr=10.0
    )
    want = {
        r["doc_id"]: r["score_micro"]
        for r in score_quality_classifier(docs, model).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = streaming_quality_score(stream, model)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("qclf_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            r["doc_id"]: r["score_micro"]
            for r in spark.sql("select * from qclf_stream_test").collect()
        }
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in plan and "Join" not in plan
    assert got == want


def test_streaming_hashed_score_matches_batch(spark):
    """The trained hashed-unigram classifier serves on a stream
    bit-for-bit equal to the batch face — the shuffle-free expression
    replay of the (bucket, occupancy) aggregation."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.text import (
        score_hashed_text_classifier,
        tokens_expr,
        train_hashed_text_classifier,
    )
    from biomedical_data_integration_spark.streaming import (
        streaming_hashed_score,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    # include degenerate rows: empty text and null text score pure bias
    extra = spark.createDataFrame(
        [(100001, ""), (100002, None)], "doc_id bigint, text string"
    )
    docs = docs.unionByName(extra)
    njoin = F.size(
        F.filter(tokens_expr(F.col("text")), lambda t: t == F.lit("join"))
    )
    model = train_hashed_text_classifier(
        docs, (njoin >= 2).cast("int"), n_buckets=64, iters=3, lr=0.4
    )
    want = {
        r["doc_id"]: r["score_micro"]
        for r in score_hashed_text_classifier(docs, model).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = streaming_hashed_score(stream, model)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("hclf_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            r["doc_id"]: r["score_micro"]
            for r in spark.sql("select * from hclf_stream_test").collect()
        }
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in plan and "Join" not in plan
    assert got == want


def test_streaming_bm25_score_matches_persisted_probe(spark):
    """The fixed-query BM25 stream gate must score every matching
    document exactly as the persisted-index batch probe does (same
    quantized idf from the frozen sidecar stats, same micro-unit
    floor); non-matching documents emit (0, 0.0) instead of being
    dropped into a top-k."""
    import os

    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_save_index,
        bm25_search_persisted,
    )
    from biomedical_data_integration_spark.streaming import (
        streaming_bm25_score,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(150)
    )
    q = "spark window join customer zzzunseen"
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "idx")
        bm25_save_index(docs, path, n_buckets=8)
        want = {
            r["doc_id"]: (r["n_terms_hit"], r["score"])
            for r in bm25_search_persisted(
                spark, path, q, top_k=100000
            ).collect()
        }
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = streaming_bm25_score(spark, stream, path, q)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("bm25_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        rows = spark.sql("select * from bm25_stream_test").collect()
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in plan and "Join" not in plan
    got = {r["doc_id"]: (r["n_terms_hit"], r["score"]) for r in rows}
    assert len(got) == docs.count()  # every doc emits
    hits = {k: v for k, v in got.items() if v[0] > 0}
    assert hits == want
    assert all(v == (0, 0.0) for k, v in got.items() if k not in want)


def test_streaming_unigram_encode_matches_batch(spark):
    """The unigram encode face (literal kernel) is a pure expression
    projection, so the SAME operator compiles onto an unbounded stream
    unchanged — tokenizer serving is stream-uniform like the classifier
    and DSIR gates. Piece sequences match the batch face exactly."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.bpe import (
        encode_unigram,
        train_unigram,
        word_counts,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    usage = train_unigram(
        word_counts(docs), vocab_size=16, iters=2, candidate_pool=40
    )
    want = {
        r["doc_id"]: r["s"]
        for r in encode_unigram(docs, usage)
        .select("doc_id", F.array_join("unigram_tokens", " ").alias("s"))
        .collect()
    }
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = encode_unigram(stream, usage).select(
            "doc_id", F.array_join("unigram_tokens", " ").alias("s")
        )
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("uenc_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            r["doc_id"]: r["s"]
            for r in spark.sql("select * from uenc_stream_test").collect()
        }
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in plan and "Join" not in plan
    assert got == want


def test_streaming_ivfpq_score_matches_batch_probe(spark):
    """The fixed-query IVFPQ stream gate (round-11 verdict item 8) must
    score every probed-cell vector exactly as ivfpq_topk does with the
    same frozen model (same cell assignment, same PQ codes, same
    integer ADC tables); vectors outside the probed cells emit
    (probed=false, adist=null) instead of being dropped."""
    import os

    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_save,
        ivfpq_topk,
    )
    from biomedical_data_integration_spark.streaming import (
        streaming_ivfpq_score,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .limit(200)
    )
    idx, cents, cb = ivfpq_index(emb, n_cells=4, m=2, n_codes=4,
                                 max_iter=2)
    q = [float(x) for x in emb.first()["embedding"]]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "idx")
        ivfpq_save(idx, cents, cb, path)
        want = {
            r["vec_id"]: r["adist"]
            for r in ivfpq_topk(idx, q, cents, cb, k=100000,
                                nprobe=2).collect()
        }
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        emb.select("vec_id", "embedding").write.parquet(src)
        stream = spark.readStream.schema(
            emb.select("vec_id", "embedding").schema
        ).parquet(src)
        out = streaming_ivfpq_score(spark, stream, path, q, nprobe=2)
        assert out.isStreaming
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in plan and "Join" not in plan
        sq = (
            out.writeStream.format("memory")
            .queryName("ivfpq_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        rows = spark.sql("select * from ivfpq_stream_test").collect()
    assert len(rows) == emb.count()  # every vector emits
    got = {r["vec_id"]: r["adist"] for r in rows if r["probed"]}
    assert got == want
    assert all(r["adist"] is None for r in rows if not r["probed"])
    # wrong-dim query refuses at construction
    import pytest as _pytest
    with tempfile.TemporaryDirectory() as d2:
        path2 = os.path.join(d2, "idx")
        ivfpq_save(idx, cents, cb, path2)
        with _pytest.raises(ValueError, match="dim"):
            streaming_ivfpq_score(spark, stream, path2, q + [0.0])
