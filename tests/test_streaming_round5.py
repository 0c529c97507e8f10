"""Round-5 streaming faces: stateful EWMA, drift monitor, BM25 scorer."""

import tempfile

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.streaming.events import (
    ewma_smooth,
    psi_readout,
    streaming_bin_counts,
    streaming_ewma,
)


def _run_stream(out, name, ckpt, mode="append"):
    sq = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(120)
    return sq


def test_streaming_ewma_matches_recursion_across_batches(spark):
    rows = [(1, i, i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    batch = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, value double"
    )
    with tempfile.TemporaryDirectory() as d:
        # two files -> two microbatches worth of data; state must carry over
        batch.where(F.col("ts") < 2).coalesce(1).write.parquet(f"{d}/src/p1")
        batch.where(F.col("ts") >= 2).coalesce(1).write.parquet(f"{d}/src/p2")
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/src/*")
        )
        out = streaming_ewma(stream, alpha=0.5)
        assert out.isStreaming
        _run_stream(out, "ewma_stream_t", f"{d}/ckpt")
        got = {
            r["ts"]: r["ewma"]
            for r in spark.sql("SELECT * FROM ewma_stream_t").collect()
        }
    # recursive fold: 10, 15, 22.5, 31.25
    assert got[0] == pytest.approx(10.0)
    assert got[1] == pytest.approx(15.0)
    assert got[2] == pytest.approx(22.5)
    assert got[3] == pytest.approx(31.25)


def test_streaming_ewma_agrees_with_wide_batch_window(spark):
    """Truncated batch twin with a window >= series length equals the
    infinite recursion only when normalization is removed; instead check
    the two agree within the documented (1-alpha)^window tail."""
    rows = [(1, i, i, float((i * 37) % 50)) for i in range(40)]
    batch = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, value double"
    )
    wide = {
        r["ts"]: r["ewma"] for r in ewma_smooth(batch, window=32).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        batch.coalesce(1).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(batch.schema).parquet(f"{d}/src")
        _run_stream(streaming_ewma(stream, alpha=0.5), "ewma_stream_w", f"{d}/ckpt")
        got = {
            r["ts"]: r["ewma"]
            for r in spark.sql("SELECT * FROM ewma_stream_w").collect()
        }
    for ts in range(35, 40):  # deep rows: truncation tail < 0.5^32
        assert got[ts] == pytest.approx(wide[ts], abs=1e-4)


def test_streaming_bin_counts_plus_readout_matches_batch_psi(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        psi_drift,
        type1_boundaries,
    )

    base = spark.createDataFrame(
        [(i, float(i % 20)) for i in range(200)], ["id", "value"]
    )
    cur = spark.createDataFrame(
        [(i, float(i % 20) + 5.0) for i in range(160)], ["id", "value"]
    )
    n_bins = 4
    want = {
        r["bin"]: r for r in psi_drift(base, cur, "value", n_bins=n_bins).collect()
    }
    bounds = type1_boundaries(base, "value", n_bins).collect()[0]["__boundaries"]
    base_counts = streaming_bin_counts(base, bounds)  # batch frame: same expr
    with tempfile.TemporaryDirectory() as d:
        cur.coalesce(1).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(cur.schema).parquet(f"{d}/src")
        out = streaming_bin_counts(stream, bounds)
        assert out.isStreaming
        _run_stream(out, "bins_stream_t", f"{d}/ckpt", mode="complete")
        cur_counts = spark.sql("SELECT * FROM bins_stream_t")
        got = {
            r["bin"]: r
            for r in psi_readout(base_counts, cur_counts, n_bins).collect()
        }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["psi_term"] == pytest.approx(want[k]["psi_term"], abs=1e-9)
        assert got[k]["psi_total"] == pytest.approx(want[k]["psi_total"], abs=1e-9)


def test_bm25_query_scorer_matches_search_and_streams(spark):
    from biomedical_data_integration_spark.operators.retrieval import (
        bm25_query_scorer,
        bm25_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the lazy dog sleeps all day long"),
            (3, "a quick brown rabbit runs past the fox den"),
            (4, "stock markets fell sharply on quarterly reports"),
        ],
        ["doc_id", "text"],
    )
    want = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_search(docs, "quick fox", top_k=10).collect()
    }
    scorer = bm25_query_scorer(docs, "quick fox")
    batch_scores = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in scorer(docs).where(F.col("score") > 0).collect()
    }
    assert batch_scores == want
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(docs.schema).parquet(f"{d}/src")
        out = scorer(stream)
        assert out.isStreaming  # stateless projection: no aggregation
        _run_stream(out, "bm25_stream_t", f"{d}/ckpt")
        got = {
            r["doc_id"]: (r["n_terms_hit"], r["score"])
            for r in spark.sql(
                "SELECT * FROM bm25_stream_t WHERE score > 0"
            ).collect()
        }
    assert got == want


def test_streaming_ewma_validates(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, 1.0)], "user_id bigint, ts bigint, event_id bigint, value double"
    )
    with pytest.raises(ValueError):
        streaming_ewma(df, alpha=1.5)
    with pytest.raises(ValueError):
        streaming_bin_counts(df, [])


def _state_rows5(sq):
    p = sq.lastProgress
    if not p:
        return None
    ops = p.get("stateOperators") or []
    return ops[0].get("numRowsTotal") if ops else None


def _wait_state5(sq, pred, deadline_s=240):
    import time

    t0 = time.time()
    while time.time() - t0 < deadline_s:
        n = _state_rows5(sq)
        if n is not None and pred(n):
            return n
        time.sleep(0.5)
    raise AssertionError(f"state never satisfied; last={_state_rows5(sq)}")


def test_streaming_ewma_state_plateaus_under_ttl(spark):
    """One state row per key; idle keys expire when the TTL fires, so
    state plateaus instead of growing with the key space."""
    import time

    with tempfile.TemporaryDirectory() as d:
        rows = [(i, 0, i, float(i)) for i in range(6)]
        b1 = spark.createDataFrame(
            rows, "user_id bigint, ts bigint, event_id bigint, value double"
        )
        b1.coalesce(1).write.parquet(f"{d}/src/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/src/*")
        )
        sq = (
            streaming_ewma(stream, state_ttl_minutes=0.15)
            .writeStream.format("memory").queryName("ewma_ttl_t")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .start()
        )
        try:
            _wait_state5(sq, lambda n: n == 6, 180)
            _wait_state5(sq, lambda n: n == 0, 240)
        finally:
            sq.stop()
            time.sleep(1.0)


def test_streaming_sequence_examples_state_plateaus_under_ttl(spark):
    """Deque state is one row per key bounded at context_len items;
    TTL drains idle keys."""
    import time

    from biomedical_data_integration_spark.streaming.events import (
        streaming_sequence_examples,
    )

    with tempfile.TemporaryDirectory() as d:
        rows = [(u, i, u * 10 + i, "view") for u in range(4) for i in range(3)]
        b1 = spark.createDataFrame(
            rows, "user_id bigint, ts bigint, event_id bigint, event_type string"
        )
        b1.coalesce(1).write.parquet(f"{d}/src/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/src/*")
        )
        sq = (
            streaming_sequence_examples(
                stream, context_len=2, state_ttl_minutes=0.15
            )
            .writeStream.format("memory").queryName("seq_ttl_t")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .start()
        )
        try:
            _wait_state5(sq, lambda n: n == 4, 180)  # one row per user
            _wait_state5(sq, lambda n: n == 0, 240)  # TTL drains
        finally:
            sq.stop()
            time.sleep(1.0)


# ---------------------------------------------------------------------------
# sequence_match (CEP-style pattern windows)
# ---------------------------------------------------------------------------


def test_sequence_match_positive_negative_and_guard(spark):
    from biomedical_data_integration_spark.streaming.events import (
        sequence_match,
    )

    rows = [
        # u1: view -> purchase in 30s, clean -> match
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:00:30", "purchase"),
        # u2: error strictly between -> killed
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:00:10", "error"),
        (2, "2024-01-01 00:00:30", "purchase"),
        # u3: purchase outside the 60s window -> no match
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 00:02:00", "purchase"),
        # u4: error AT the purchase ts does not kill (documented tie rule)
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-01 00:00:20", "purchase"),
        (4, "2024-01-01 00:00:20", "error"),
        # u5: two views share the SAME next purchase -> two matches
        (5, "2024-01-01 00:00:00", "view"),
        (5, "2024-01-01 00:00:10", "view"),
        (5, "2024-01-01 00:00:40", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sequence_match(
        df, "view", "purchase", within_seconds=60, without="error"
    )
    got = {(r["user"], r["gap_seconds"]) for r in out.collect()}
    assert got == {(1, 30), (4, 20), (5, 40), (5, 30)}
    # without the guard, u2 matches too
    out2 = sequence_match(df, "view", "purchase", within_seconds=60)
    assert {(r["user"], r["gap_seconds"]) for r in out2.collect()} == {
        (1, 30), (2, 30), (4, 20), (5, 40), (5, 30)
    }


def test_sequence_match_single_exchange_plan(spark):
    from biomedical_data_integration_spark.streaming.events import (
        sequence_match,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "view")],
        "user_id bigint, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sequence_match(df, "view", "purchase", 60, without="error")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both windows stack on ONE user-keyed exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_streaming_sequence_match_equals_batch(spark):
    import tempfile

    from biomedical_data_integration_spark.streaming.events import (
        sequence_match,
        streaming_sequence_match,
    )

    (events,) = [
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ]
    want = sorted(
        map(
            tuple,
            sequence_match(
                events, "view", "purchase", 3600, without="error"
            ).collect(),
        )
    )
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = streaming_sequence_match(
            stream, "view", "purchase", 3600, without="error"
        )
        sq = (
            out.writeStream.format("memory")
            .queryName("cep_stream")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = sorted(
            map(tuple, spark.sql("select * from cep_stream").collect())
        )
    assert got == want and len(got) > 0


def test_streaming_sequence_match_across_batches(spark):
    import tempfile

    from pyspark.sql import Row

    from biomedical_data_integration_spark.streaming.events import (
        streaming_sequence_match,
    )

    schema = "user_id bigint, ts timestamp, event_type string"
    b1 = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "view"),      # matches in batch 2
            (2, "2024-01-01 00:00:00", "view"),      # guarded in batch 2
            (3, "2024-01-01 00:00:00", "view"),      # expires (then too late)
        ],
        "user_id bigint, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [
            (1, "2024-01-01 00:30:00", "purchase"),
            (2, "2024-01-01 00:10:00", "error"),
            (2, "2024-01-01 00:30:00", "purchase"),
            (3, "2024-01-01 02:30:00", "purchase"),
        ],
        "user_id bigint, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        b1.coalesce(1).write.mode("append").parquet(src)
        b2.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        # no processing-time TTL here: an armed wall-clock timer for the
        # still-pending user keeps the engine scheduling no-data batches,
        # so the processAllAvailable drain below would never return (the
        # operator docstring documents the trade). Window expiry — the
        # semantics under test — is event-time pruning, not TTL.
        out = streaming_sequence_match(
            stream, "view", "purchase", 3600, without="error",
        )
        sq = (
            out.writeStream.format("memory")
            .queryName("cep_stream2")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            (r["user"], r["gap_seconds"])
            for r in spark.sql("select * from cep_stream2").collect()
        }
    # only user 1 matches: 2 is guarded, 3's purchase falls outside 1h
    assert got == {(1, 1800)}


def test_ohlc_bars_golden(spark):
    from biomedical_data_integration_spark.streaming.events import ohlc_bars

    rows = [
        ("m", "2024-01-01 10:05:00", 10.0),
        ("m", "2024-01-01 10:20:00", 30.0),
        ("m", "2024-01-01 10:40:00", 5.0),
        ("m", "2024-01-01 10:55:00", 20.0),
        ("m", "2024-01-01 11:10:00", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        str(r["bucket_start"]): r
        for r in ohlc_bars(df).collect()
    }
    b10 = out["2024-01-01 10:00:00"]
    assert (b10["open"], b10["high"], b10["low"], b10["close"], b10["n"]) == (
        10.0, 30.0, 5.0, 20.0, 4,
    )
    assert out["2024-01-01 11:00:00"]["open"] == 7.0
    # tie at the opening instant: struct order resolves to the SMALLER value
    tie = spark.createDataFrame(
        [("m", "2024-01-01 10:00:00", 9.0), ("m", "2024-01-01 10:00:00", 4.0)],
        "event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ohlc_bars(tie).collect()[0]
    assert r["open"] == 4.0 and r["close"] == 9.0


def test_time_weighted_average_vs_plain_mean(spark):
    from biomedical_data_integration_spark.streaming.events import (
        time_weighted_average,
    )

    # 100 for 59 minutes, 0 for 1 minute: twap ~ 98.3, plain mean 50
    rows = [
        ("m", "2024-01-01 10:00:00", 100.0),
        ("m", "2024-01-01 10:59:00", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = time_weighted_average(df).collect()[0]
    assert abs(r["twap"] - 100.0 * 59 / 60) < 1e-6
    assert r["n"] == 2
    # single observation holds to bucket end
    one = spark.createDataFrame(
        [("m", "2024-01-01 10:30:00", 42.0)],
        "event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert time_weighted_average(one).collect()[0]["twap"] == 42.0


def test_seasonal_decompose_golden(spark):
    from biomedical_data_integration_spark.streaming.events import (
        seasonal_decompose,
    )

    # pure weekly sawtooth on a flat base: residuals vanish, seasonal
    # recovers the phase offsets, trend recovers the base
    base = 100.0
    season = [0.0, 7.0, -7.0]  # period 3
    rows = []
    for i in range(12):
        day = f"2024-01-{i + 1:02d} 06:00:00"
        rows.append((day, base + season[(i + 2) % 3]))  # 2024-01-01 is phase 2
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), F.col("v")
    )
    out = seasonal_decompose(df, "v", "ts", period=3)
    got = {str(r["day"]): r for r in out.collect()}
    assert len(got) == 12
    # edges have no full window
    assert got["2024-01-01"]["trend"] is None
    assert got["2024-01-12"]["trend"] is None
    mid = got["2024-01-05"]
    assert abs(mid["trend"] - base) < 1e-6
    assert abs(mid["value"] - (base + season[(4 + 2) % 3])) < 1e-6
    assert abs(mid["seasonal"] - season[(4 + 2) % 3]) < 1e-6
    assert abs(mid["residual"]) < 1e-6
    # decomposition identity wherever all parts are defined
    for r in got.values():
        if r["trend"] is not None and r["seasonal"] is not None:
            assert abs(
                r["value"] - (r["trend"] + r["seasonal"] + r["residual"])
            ) < 1e-5


def test_seasonal_decompose_grouped_and_daily_presum(spark):
    from biomedical_data_integration_spark.streaming.events import (
        seasonal_decompose,
    )

    # two observations on one day are summed before decomposition;
    # groups decompose independently
    rows = [
        ("g1", "2024-01-01 01:00:00", 1.0),
        ("g1", "2024-01-01 13:00:00", 2.0),
        ("g1", "2024-01-02 01:00:00", 5.0),
        ("g1", "2024-01-03 01:00:00", 4.0),
        ("g2", "2024-01-01 01:00:00", 9.0),
        ("g2", "2024-01-02 01:00:00", 9.0),
        ("g2", "2024-01-03 01:00:00", 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.to_timestamp("ts").alias("ts"), "v"
    )
    out = seasonal_decompose(df, "v", "ts", group_col="g", period=3)
    got = {(r["g"], str(r["day"])): r for r in out.collect()}
    assert got[("g1", "2024-01-01")]["value"] == 3.0
    assert abs(got[("g1", "2024-01-02")]["trend"] - 4.0) < 1e-6
    assert abs(got[("g2", "2024-01-02")]["trend"] - 9.0) < 1e-6
    assert abs(got[("g2", "2024-01-02")]["residual"]) < 1e-6


def test_seasonal_decompose_rejects_even_period(spark):
    from biomedical_data_integration_spark.streaming.events import (
        seasonal_decompose,
    )

    df = spark.createDataFrame([("2024-01-01", 1.0)], "ts string, v double")
    with pytest.raises(ValueError, match="odd period"):
        seasonal_decompose(df, "v", "ts", period=4)
    with pytest.raises(ValueError, match="period must be"):
        seasonal_decompose(df, "v", "ts", period=1)


def test_streaming_ohlc_matches_batch(spark):
    import datetime as dt

    from biomedical_data_integration_spark.streaming.events import (
        ohlc_bars,
        streaming_ohlc_bars,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        ("a", base + dt.timedelta(minutes=m), v)
        for m, v in [(0, 5.0), (10, 9.0), (20, 1.0), (50, 7.0), (70, 3.0)]
    ] + [("b", base + dt.timedelta(minutes=5), 2.0)]
    events = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        sq = (
            streaming_ohlc_bars(stream, watermark="10 hours")
            .writeStream.format("memory")
            .queryName("ohlc_stream_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            tuple(r)
            for r in spark.sql("select * from ohlc_stream_test").collect()
        }
    want = {tuple(r) for r in ohlc_bars(events, bucket="hour").collect()}
    assert got == want
    # sanity on the bar itself: hour 0 of "a" opens 5, closes 7
    bars = {(r[0], r[1]): r for r in want}
    b = bars[("a", base)]
    assert (b[2], b[3], b[4], b[5], b[6]) == (5.0, 9.0, 1.0, 7.0, 4)


def test_streaming_twap_emits_exact_bars_on_watermark_close(spark):
    import datetime as dt

    from biomedical_data_integration_spark.streaming.events import (
        streaming_time_weighted_average,
        time_weighted_average,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        ("a", base + dt.timedelta(minutes=m), v)
        for m, v in [(0, 10.0), (30, 20.0), (45, 40.0)]
    ] + [("b", base + dt.timedelta(minutes=10), 6.0)]
    events = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    # a sentinel far in the future pushes the watermark past hour 0 in
    # the SECOND microbatch, closing the hour-0 bars
    sentinel = spark.createDataFrame(
        [("zzz", base + dt.timedelta(days=2), 0.0)],
        ["event_type", "ts", "value"],
    )
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        # one part-file per batch and a watermark wider than the in-hour
        # spread: with maxFilesPerTrigger=1, a multi-part b0 would split
        # across triggers and a tight watermark could drop the earlier
        # samples as late (observed flake)
        events.coalesce(1).write.parquet(f"{src}/b0")
        import time as _time

        _time.sleep(1.1)  # file-source orders by mtime: b0 strictly first
        sentinel.coalesce(1).write.parquet(f"{src}/b1")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        sq = (
            streaming_time_weighted_average(stream, watermark="2 hours")
            .writeStream.format("memory")
            .queryName("twap_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            (r["event_type"], r["bucket_start"]): (r["twap"], r["n"])
            for r in spark.sql("select * from twap_stream_test").collect()
        }
    h0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # batch parity on the closed bars
    want = {
        (r["event_type"], int(r["bucket_start"].timestamp())): (
            r["twap"],
            r["n"],
        )
        for r in time_weighted_average(events, bucket="hour").collect()
    }
    assert got[("a", h0)] == want[("a", h0)]
    assert got[("b", h0)] == want[("b", h0)]
    # hand value: 10 for 30min, 20 for 15min, 40 for 15min -> 20.0
    assert got[("a", h0)][0] == 20.0 and got[("a", h0)][1] == 3


def test_attribute_conversions_linear_golden(spark):
    import datetime as dt

    from biomedical_data_integration_spark.streaming.events import (
        attribute_conversions_linear,
    )

    base = dt.datetime(2026, 1, 10, 12, 0, 0)
    rows = [
        # user 1: two in-window touches then a 9.0 purchase -> 4.5 each
        (1, 1, base - dt.timedelta(days=2), "click", 0.0),
        (1, 2, base - dt.timedelta(days=1), "view", 0.0),
        (1, 3, base, "purchase", 9.0),
        # user 1: a second purchase later sees THREE prior touches? no —
        # only touches before it and within 30d: touches 1,2 qualify
        # user 2: touch outside the lookback -> unattributed
        (2, 4, base - dt.timedelta(days=40), "click", 0.0),
        (2, 5, base, "purchase", 5.0),
        # user 3: no touches at all -> unattributed
        (3, 6, base, "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp,"
        " event_type string, value double"
    )
    out = attribute_conversions_linear(df, lookback_days=30)
    got = sorted(
        (r["user_id"], r["conv_event_id"], r["touch_event_id"],
         r["credit_value"])
        for r in out.collect()
    )
    assert got == [
        (1, 3, "1", 4.5),
        (1, 3, "2", 4.5),
        (2, 5, None, 5.0),
        (3, 6, None, 7.0),
    ]
    # credit totals reconcile with conversion value
    tot = sum(c for *_, c in got)
    assert abs(tot - 21.0) < 1e-6


def test_attribute_conversions_linear_boundary_strictness(spark):
    import datetime as dt

    from biomedical_data_integration_spark.streaming.events import (
        attribute_conversions_linear,
    )

    base = dt.datetime(2026, 1, 10, 12, 0, 0)
    rows = [
        # touch AT the conversion instant does not qualify (strictly before)
        (1, 1, base, "click", 0.0),
        # touch EXACTLY lookback ago qualifies (>= boundary)
        (1, 2, base - dt.timedelta(days=30), "view", 0.0),
        (1, 3, base, "purchase", 6.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp,"
        " event_type string, value double"
    )
    got = {
        r["touch_event_id"]: r["credit_value"]
        for r in attribute_conversions_linear(df, lookback_days=30).collect()
    }
    assert got == {"2": 6.0}


def test_cohort_ltv_golden(spark):
    import datetime as dt

    from biomedical_data_integration_spark.streaming.events import cohort_ltv

    # two users entering the same 7d period; revenue over two offsets
    d0 = dt.datetime(2026, 1, 1, 0, 0, 0)  # period floor depends on epoch
    rows = [
        (1, d0, "click", 0.0),
        (1, d0 + dt.timedelta(days=1), "purchase", 10.0),
        (2, d0 + dt.timedelta(days=2), "purchase", 4.0),
        (1, d0 + dt.timedelta(days=9), "purchase", 6.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    out = sorted(
        (r["period_offset"], r["cohort_users"], r["revenue"],
         r["cum_revenue_per_user"])
        for r in cohort_ltv(df, period_days=7).collect()
    )
    # all events share one cohort (same 7d bucket); offsets 0 and 1
    assert out[0][:3] == (0, 2, 14.0) and out[0][3] == 7.0
    assert out[1][:3] == (1, 2, 6.0) and out[1][3] == 10.0


def test_cohort_ltv_cohort_fixed_at_entry(spark):
    import datetime as dt

    from biomedical_data_integration_spark.streaming.events import cohort_ltv

    # user 3 enters a LATER period: separate cohort, own denominator
    d0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, d0, "purchase", 8.0),
        (3, d0 + dt.timedelta(days=30), "purchase", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    out = cohort_ltv(df, period_days=7).collect()
    assert len(out) == 2
    assert {(r["cohort_users"], r["revenue"]) for r in out} == {
        (1, 8.0), (1, 2.0)
    }


def test_streaming_corpus_prep_matches_batch_flagship(spark):
    from biomedical_data_integration_spark.streaming.events import (
        streaming_corpus_prep,
    )
    import __spark_entry__ as entry

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {
        tuple(r)
        for r in entry.queries()["corpus_prep_end_to_end"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = streaming_corpus_prep(
            stream,
            lang=entry.PREP_LANG,
            min_clf_score=entry.PREP_MIN_CLF,
            chunk_tokens=entry.CHUNK_TOKENS,
            overlap=entry.CHUNK_OVERLAP,
        )
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("corpus_prep_stream_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            tuple(r)
            for r in spark.sql(
                "select * from corpus_prep_stream_test"
            ).collect()
        }
    assert got == want and len(got) > 0


def test_streaming_corpus_prep_dedups_across_batches(spark):
    from biomedical_data_integration_spark.streaming.events import (
        streaming_corpus_prep,
    )

    good = (
        "this is a perfectly reasonable document with enough words to "
        "pass the quality classifier. it has punctuation, sentences, "
        "and a normal amount of repetition for english text."
    )
    d1 = [(1, good)]
    d2 = [(2, good), (3, good + " and one more unique sentence here.")]
    schema = "doc_id bigint, text string"
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        spark.createDataFrame(d1, schema).write.parquet(f"{src}/b0")
        spark.createDataFrame(d2, schema).write.parquet(f"{src}/b1")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        out = streaming_corpus_prep(stream, chunk_tokens=16)
        sq = (
            out.writeStream.format("memory")
            .queryName("corpus_prep_dedup_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        ids = {
            r["id"]
            for r in spark.sql(
                "select * from corpus_prep_dedup_test"
            ).collect()
        }
    # doc 2 is a cross-batch exact duplicate of doc 1 -> dropped
    assert 1 in ids and 3 in ids and 2 not in ids


def test_sliding_active_users_golden(spark):
    from biomedical_data_integration_spark.streaming.events import (
        sliding_active_users,
    )

    rows = [
        (1, "2024-01-01 05:00:00"),
        (1, "2024-01-01 09:00:00"),  # same user+day: one pair
        (2, "2024-01-03 00:00:00"),
        (1, "2024-01-05 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    out = {
        str(r["day"]): r["active_users"]
        for r in sliding_active_users(df, window_days=3).collect()
    }
    # day 1: {1}; day 3: {1 (from d1), 2}; day 5: {2 (from d3), 1}
    assert out["2024-01-01"] == 1
    assert out["2024-01-03"] == 2
    assert out["2024-01-05"] == 2
    # day 4: window [2..4] -> only user 2
    assert out["2024-01-04"] == 1
    # no fabricated tail past the last observed activity day (Jan 5):
    # the Jan-5 pair would otherwise project end days Jan 6 and Jan 7
    assert "2024-01-06" not in out and "2024-01-07" not in out
    assert max(out) == "2024-01-05"
    # window of 1 day degenerates to daily uniques
    daily = {
        str(r["day"]): r["active_users"]
        for r in sliding_active_users(df, window_days=1).collect()
    }
    assert daily == {
        "2024-01-01": 1, "2024-01-03": 1, "2024-01-05": 1,
    }


def test_rfm_scores_golden(spark):
    from biomedical_data_integration_spark.streaming.events import rfm_scores

    rows = [
        # user 1: recent, frequent, big spender
        (1, "2024-01-10 00:00:00", "purchase", 100.0),
        (1, "2024-01-10 01:00:00", "click", 0.0),
        (1, "2024-01-09 00:00:00", "purchase", 50.0),
        # user 2: old, single, no spend
        (2, "2024-01-01 00:00:00", "click", 0.0),
        # user 3: middling
        (3, "2024-01-05 00:00:00", "purchase", 10.0),
        (3, "2024-01-06 00:00:00", "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts string, event_type string, value double"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type", "value")
    out = {r["user_id"]: r for r in rfm_scores(df, n_tiles=3).collect()}
    # reference day = 2024-01-10 (user 1's last)
    assert out[1]["recency_days"] == 0 and out[2]["recency_days"] == 9
    assert out[1]["frequency"] == 3 and out[2]["frequency"] == 1
    assert out[1]["monetary"] == 150.0 and out[2]["monetary"] == 0.0
    # best on all axes / worst on all axes
    assert (out[1]["r_score"], out[1]["f_score"], out[1]["m_score"]) == (3, 3, 3)
    assert (out[2]["r_score"], out[2]["f_score"], out[2]["m_score"]) == (1, 1, 1)
    assert out[3]["segment"] == "2-2-2"


def test_rfm_scores_deterministic_tie_split(spark):
    from biomedical_data_integration_spark.streaming.events import rfm_scores

    # four users with IDENTICAL metrics: tiles split by user id, stably
    rows = [
        (u, "2024-01-01 00:00:00", "click", 0.0) for u in (10, 20, 30, 40)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts string, event_type string, value double"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type", "value")
    a = {(r["user_id"], r["segment"]) for r in rfm_scores(df, n_tiles=2).collect()}
    b = {
        (r["user_id"], r["segment"])
        for r in rfm_scores(df.repartition(7), n_tiles=2).collect()
    }
    assert a == b
    assert {s for _, s in a} == {"1-1-1", "2-2-2"}


def test_audience_overlap_daily_golden(spark):
    from biomedical_data_integration_spark.streaming.events import (
        audience_overlap_daily,
    )

    rows = [
        (1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-01"),
        (2, "2024-01-02"), (3, "2024-01-02"), (4, "2024-01-02"),
        (9, "2024-01-04"),  # gap: no Jan 3 row, Jan 4 has no yesterday
    ]
    df = spark.createDataFrame(rows, "user_id bigint, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    out = {str(r["day"]): r for r in audience_overlap_daily(df).collect()}
    assert set(out) == {"2024-01-02"}  # only days with a previous day
    r = out["2024-01-02"]
    assert (r["active"], r["returning"], r["new_users"], r["churned"]) == (
        3, 2, 1, 1
    )
    assert abs(r["jaccard"] - 0.5) < 1e-6  # |{2,3}| / |{1,2,3,4}|


def test_markov_stationary_golden_two_state(spark):
    from biomedical_data_integration_spark.streaming.events import (
        markov_stationary,
    )

    # user journey a->b->a->b->a->a... engineered counts:
    # from a: 2x to b, 2x to a ; from b: 2x to a -> P = [[.5,.5],[1,0]]
    # stationary: pi_a = 2/3, pi_b = 1/3
    seq = ["a", "b", "a", "a", "a", "b", "a"]
    rows = [
        (1, i, f"2024-01-01 0{i}:00:00", t) for i, t in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts string, event_type string"
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"),
             "event_type")
    out = {r["state"]: r for r in markov_stationary(df).collect()}
    assert abs(out["a"]["pi"] - 2 / 3) < 1e-4
    assert abs(out["b"]["pi"] - 1 / 3) < 1e-4
    assert out["a"]["n_out"] == 4 and out["b"]["n_out"] == 2


def test_markov_stationary_dangling_state_self_loops(spark):
    from biomedical_data_integration_spark.streaming.events import (
        markov_stationary,
    )

    # "end" never transitions out: absorbing -> all mass converges there
    rows = [
        (1, 0, "2024-01-01 00:00:00", "start"),
        (1, 1, "2024-01-01 01:00:00", "end"),
        (2, 2, "2024-01-01 00:00:00", "start"),
        (2, 3, "2024-01-01 01:00:00", "end"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts string, event_type string"
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"),
             "event_type")
    out = {r["state"]: r for r in markov_stationary(df).collect()}
    assert out["end"]["pi"] > 0.99
    assert out["start"]["n_out"] == 2 and out["end"]["n_out"] == 0


def test_markov_attribution_golden(spark):
    from biomedical_data_integration_spark.streaming.events import (
        markov_attribution,
    )

    # u1: click -> purchase ; u2: view -> (no purchase)
    rows = [
        (1, 0, "2024-01-01 00:00:00", "click"),
        (1, 1, "2024-01-01 01:00:00", "purchase"),
        (2, 2, "2024-01-01 00:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts string, event_type string"
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"),
             "event_type")
    out = {r["channel"]: r for r in markov_attribution(
        df, touch_types=("click", "view")
    ).collect()}
    # base P(conv) = 0.5; removing click kills the only converting path
    assert out["click"]["p_conv_full"] == 0.5
    assert out["click"]["p_conv_removed"] == 0.0
    assert out["click"]["removal_effect"] == 1.0
    assert out["click"]["attribution_share"] == 1.0
    # view never converts: zero removal effect, zero share
    assert out["view"]["p_conv_removed"] == 0.5
    assert out["view"]["removal_effect"] == 0.0
    assert out["view"]["attribution_share"] == 0.0
    assert out["click"]["n_touches"] == 1 and out["view"]["n_touches"] == 1


def test_markov_attribution_multi_journey_split(spark):
    from biomedical_data_integration_spark.streaming.events import (
        markov_attribution,
    )

    # one user, TWO journeys split by the first purchase:
    # j0: click -> purchase (converts), j1: view -> (open, NULL)
    rows = [
        (1, 0, "2024-01-01 00:00:00", "click"),
        (1, 1, "2024-01-01 01:00:00", "purchase"),
        (1, 2, "2024-01-01 02:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts string, event_type string"
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"),
             "event_type")
    out = {r["channel"]: r for r in markov_attribution(
        df, touch_types=("click", "view")
    ).collect()}
    # same chain as the two-user case: journeys split correctly
    assert out["click"]["removal_effect"] == 1.0
    assert out["view"]["removal_effect"] == 0.0


def test_shapley_attribution_golden(spark):
    from biomedical_data_integration_spark.streaming.events import (
        shapley_attribution,
    )

    # journeys: {click}->conv, {view}->no, {click,view}->conv
    rows = [
        (1, 0, "2024-01-01 00:00:00", "click"),
        (1, 1, "2024-01-01 01:00:00", "purchase"),
        (2, 2, "2024-01-01 00:00:00", "view"),
        (3, 3, "2024-01-01 00:00:00", "click"),
        (3, 4, "2024-01-01 00:30:00", "view"),
        (3, 5, "2024-01-01 01:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts string, event_type string"
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"),
             "event_type")
    out = {r["channel"]: r for r in shapley_attribution(
        df, touch_types=("click", "view")
    ).collect()}
    # v({c})=1, v({v})=0, v({c,v})=1 -> phi_c=1, phi_v=0
    assert out["click"]["shapley_value"] == 1.0
    assert out["view"]["shapley_value"] == 0.0
    assert out["click"]["share"] == 1.0 and out["view"]["share"] == 0.0
    assert out["click"]["n_journeys_with"] == 2
    assert out["view"]["n_journeys_with"] == 2


def test_shapley_attribution_symmetry(spark):
    from biomedical_data_integration_spark.streaming.events import (
        shapley_attribution,
    )

    # symmetric channels must split credit equally (Shapley symmetry axiom)
    rows = [
        (1, 0, "2024-01-01 00:00:00", "click"),
        (1, 1, "2024-01-01 00:30:00", "view"),
        (1, 2, "2024-01-01 01:00:00", "purchase"),
        (2, 3, "2024-01-01 00:00:00", "view"),
        (2, 4, "2024-01-01 00:30:00", "click"),
        (2, 5, "2024-01-01 01:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts string, event_type string"
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"),
             "event_type")
    out = {r["channel"]: r for r in shapley_attribution(
        df, touch_types=("click", "view")
    ).collect()}
    assert out["click"]["shapley_value"] == out["view"]["shapley_value"]
    assert out["click"]["share"] == 0.5 and out["view"]["share"] == 0.5


def test_streaming_srm_monitor_equals_batch(spark):
    """streaming_variant_counts (complete-mode snapshot) + srm_readout
    == batch srm_check on the same rows."""
    import tempfile

    from biomedical_data_integration_spark.operators.evaluation import (
        srm_check,
        srm_readout,
    )
    from biomedical_data_integration_spark.streaming.events import (
        streaming_variant_counts,
    )

    rows = [("A",)] * 55 + [("B",)] * 45
    batch = spark.createDataFrame(rows, "variant string")
    expected = {"A": 0.5, "B": 0.5}
    want = sorted(map(tuple, srm_check(batch, "variant", expected).collect()))

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        batch.repartition(3).write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        counts = streaming_variant_counts(stream, "variant")
        sq = (
            counts.writeStream.format("memory")
            .queryName("srm_counts")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        snap = spark.sql("select * from srm_counts")
        got = sorted(map(tuple, srm_readout(snap, expected).collect()))
    assert got == want


def test_streaming_jsd_monitor_readout(spark):
    """streaming_bin_counts + jsd_readout: identical distributions give
    jsd_total ~ 0; disjoint distributions give ln 2."""
    import math

    from biomedical_data_integration_spark.streaming.events import (
        jsd_readout,
        streaming_bin_counts,
    )

    bounds = [100.0, 200.0, 300.0, 400.0]
    base = spark.createDataFrame([(50.0,)] * 5 + [(250.0,)] * 5, "value double")
    same = jsd_readout(
        streaming_bin_counts(base, bounds), streaming_bin_counts(base, bounds)
    ).collect()
    assert all(abs(r["jsd_total"]) < 1e-9 for r in same)
    far = spark.createDataFrame([(450.0,)] * 10, "value double")
    diff = jsd_readout(
        streaming_bin_counts(base, bounds), streaming_bin_counts(far, bounds)
    ).collect()
    assert all(abs(r["jsd_total"] - math.log(2)) < 1e-5 for r in diff)


def test_streaming_jsd_readout_one_sided_is_null(spark):
    """An empty/all-zero side yields NULL jsd (ADVICE r8), not an ANSI
    divide-by-zero — the js_divergence contract this function shares."""
    from biomedical_data_integration_spark.streaming.events import (
        jsd_readout,
        streaming_bin_counts,
    )

    bounds = [100.0, 200.0]
    base = spark.createDataFrame([(50.0,)] * 5, "value double")
    empty = spark.createDataFrame([], "value double")
    out = jsd_readout(
        streaming_bin_counts(base, bounds), streaming_bin_counts(empty, bounds)
    ).collect()
    assert out, "baseline bins must still appear"
    assert all(r["jsd_term"] is None and r["jsd_total"] is None for r in out)
    # both-zero counts tables (schema-only) also stay NULL, no throw
    zero = streaming_bin_counts(empty, bounds)
    out2 = jsd_readout(zero, zero).collect()
    assert all(r["jsd_total"] is None for r in out2)


def test_streaming_minhash_join_matches_batch_candidates(spark):
    """The stateless stream-static incremental-dedup candidate join
    emits exactly the batch minhash_lsh_join candidate set."""
    import tempfile

    from biomedical_data_integration_spark.operators.dedup import (
        minhash_corpus_entries,
        minhash_lsh_join,
    )
    from biomedical_data_integration_spark.streaming.events import (
        streaming_minhash_join_candidates,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "until the corpus remembers it")
    corpus = spark.createDataFrame(
        [(0, base), (2, "entirely different standing corpus text about "
                        "watermarks and state stores in streaming engines")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, base + " now"), (3, "fresh novel never-seen material with no "
                                 "overlap in any shingle window at all")],
        "doc_id bigint, text string",
    )
    want = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_lsh_join(new, corpus, verify_threshold=0.0).collect()
    }
    entries = minhash_corpus_entries(corpus)
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        new.write.parquet(src)
        stream = spark.readStream.schema(new.schema).parquet(src)
        out = streaming_minhash_join_candidates(stream, entries)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("mh_join_cands")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = {
            (r["new_id"], r["corpus_id"])
            for r in spark.sql(
                "select distinct new_id, corpus_id from mh_join_cands"
            ).collect()
        }
    assert got == want and (1, 0) in got


def test_streaming_embedding_stats_plus_drift_readout_matches_batch(spark):
    """Embedding-health drift monitor (round-9): the maintained
    O(dim) stats state runs as ONE complete-mode streaming groupBy,
    and the readout over the materialized snapshot must equal the
    batch embedding_health_drift row exactly (identical expressions
    on exact integer sums)."""
    from biomedical_data_integration_spark.operators.clustering import (
        embedding_health_drift,
        embedding_health_drift_readout,
        embedding_stats_state,
    )

    base = spark.createDataFrame(
        [(i, [1.0, 0.1 * (i % 5), 0.0]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    cur = spark.createDataFrame(
        # drifted snapshot: collapsed spread + one dead vector
        [(i, [0.9, 0.0, 0.0]) for i in range(30)]
        + [(99, [0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    want = embedding_health_drift(base, cur).collect()[0].asDict()
    base_stats = embedding_stats_state(base)  # batch frame: same expr
    with tempfile.TemporaryDirectory() as d:
        cur.coalesce(1).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(cur.schema).parquet(f"{d}/src")
        out = embedding_stats_state(stream)
        assert out.isStreaming
        _run_stream(out, "emb_stats_t", f"{d}/ckpt", mode="complete")
        cur_stats = spark.sql("SELECT * FROM emb_stats_t")
        got = (
            embedding_health_drift_readout(base_stats, cur_stats)
            .collect()[0]
            .asDict()
        )
    assert got == want
    # the drift face actually SEES the regression
    assert want["zero_frac_b"] > 0 and want["d_anisotropy"] is not None


def test_streaming_quality_gates_match_batch(spark):
    """gopher_rules and c4_clean are pure expression projections, so the
    SAME operator compiles onto an unbounded stream (the corpus_prep
    contract) — microbatch output must equal the batch face row-for-row,
    and the plans must stay stateless (no aggregation)."""
    from biomedical_data_integration_spark.operators.text import (
        c4_clean,
        gopher_rules,
    )

    docs = spark.createDataFrame(
        [
            (1, "A clean first sentence stands right here today.\n"
                "short.\nAnother full sentence follows with plenty of words."),
            (2, "the data pipeline reads parquet files and writes shards "
                "that training jobs consume with care and joy every day."),
            (3, "no punct few words"),
        ],
        ["doc_id", "text"],
    )
    want_g = {tuple(r) for r in gopher_rules(docs, min_words=5).collect()}
    want_c = {tuple(r) for r in c4_clean(docs).collect()}
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(docs.schema).parquet(f"{d}/src")
        out_g = gopher_rules(stream, min_words=5)
        out_c = c4_clean(stream)
        assert out_g.isStreaming and out_c.isStreaming
        _run_stream(out_g, "gopher_stream_t", f"{d}/ck1")
        _run_stream(out_c, "c4_stream_t", f"{d}/ck2")
        got_g = {tuple(r) for r in spark.sql("SELECT * FROM gopher_stream_t").collect()}
        got_c = {tuple(r) for r in spark.sql("SELECT * FROM c4_stream_t").collect()}
    assert got_g == want_g
    assert got_c == want_c


def test_streaming_pq_encode_matches_batch(spark):
    """PQ serving face: with trained codebooks as literals, pq_encode is
    a stateless projection — an arriving vector stream encodes to the
    exact batch codes (the assign_clusters serving pattern)."""
    from biomedical_data_integration_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(24)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = pq_train(df, m=2, n_codes=4, max_iter=1)
    want = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, cb).collect()}
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(df.schema).parquet(f"{d}/src")
        out = pq_encode(stream, cb)
        assert out.isStreaming
        _run_stream(out, "pq_stream_t", f"{d}/ckpt")
        got = {
            r["vec_id"]: list(r["codes"])
            for r in spark.sql("SELECT * FROM pq_stream_t").collect()
        }
    assert got == want
