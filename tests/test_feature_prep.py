"""Target encoding and next-item sequence-example construction."""

import math

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.profiling import target_encode
from biomedical_data_integration_spark.streaming.events import sequence_examples


def _toy(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "a", 0.0),
            (3, "a", 1.0),
            (4, "b", 0.0),
            (5, "b", 0.0),
            (6, "c", 1.0),
        ],
        ["id", "cat", "y"],
    )


def test_target_encode_smoothed_formula(spark):
    got = {
        r["id"]: r["cat_te"]
        for r in target_encode(_toy(spark), "cat", "y", smoothing=2.0).collect()
    }
    prior = 3.0 / 6.0
    q = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    assert got[1] == pytest.approx(q((2.0 + prior * 2) / (3 + 2)), abs=1e-9)
    assert got[4] == pytest.approx(q((0.0 + prior * 2) / (2 + 2)), abs=1e-9)
    assert got[6] == pytest.approx(q((1.0 + prior * 2) / (1 + 2)), abs=1e-9)


def test_target_encode_leave_one_out(spark):
    got = {
        r["id"]: r["cat_te"]
        for r in target_encode(
            _toy(spark), "cat", "y", smoothing=0.0, leave_one_out=True
        ).collect()
    }
    prior = 0.5
    # id=1 (cat a, y=1): loo sum = 1, n = 2 -> 0.5 ; id=2 (y=0): loo = 2/2 = 1
    assert got[1] == pytest.approx(0.5, abs=1e-9)
    assert got[2] == pytest.approx(1.0, abs=1e-9)
    # singleton category falls back to the prior
    assert got[6] == pytest.approx(prior, abs=1e-9)


def test_target_encode_unseen_and_validation(spark):
    df = spark.createDataFrame([(1, None, 1.0), (2, "a", None)], ["id", "cat", "y"])
    enc = {r["id"]: r["cat_te"] for r in target_encode(df, "cat", "y").collect()}
    # null category gets its own group; row with null target -> prior-only stats
    assert enc[1] is not None
    with pytest.raises(ValueError):
        target_encode(df, "cat", "y", smoothing=-1)


def test_sequence_examples_contexts(spark):
    df = spark.createDataFrame(
        [(1, i, i, t) for i, t in enumerate(["v", "c", "p", "v"])]
        + [(2, 0, 10, "s")],
        ["user_id", "ts", "event_id", "event_type"],
    )
    got = {
        (r["user_id"], r["ts"]): (r["context"], r["label"])
        for r in sequence_examples(df, context_len=2).collect()
    }
    assert got[(1, 1)] == (["v"], "c")
    assert got[(1, 2)] == (["v", "c"], "p")
    assert got[(1, 3)] == (["c", "p"], "v")  # bounded at 2, oldest dropped
    assert (1, 0) not in got  # no context -> dropped
    assert (2, 0) not in got


def test_sequence_examples_min_context_zero_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, "a")], ["user_id", "ts", "event_id", "event_type"]
    )
    got = sequence_examples(df, min_context=0).collect()
    assert got[0]["context"] == [] and got[0]["label"] == "a"


def test_sequence_examples_validates(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, "a")], ["user_id", "ts", "event_id", "event_type"]
    )
    with pytest.raises(ValueError):
        sequence_examples(df, context_len=0)
    with pytest.raises(ValueError):
        sequence_examples(df, min_context=-1)


def test_categorical_association_golden(spark):
    import math

    from biomedical_data_integration_spark.operators.profiling import (
        categorical_association,
    )

    # perfectly dependent: b == a
    df = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, ["a", "b"]
    )
    rows = categorical_association(df, "a", "b").collect()
    mi = rows[0]["mutual_information"]
    assert mi == pytest.approx(math.log(2), abs=1e-5)  # H = ln 2 for 50/50
    chi = rows[0]["chi_square"]
    assert chi == pytest.approx(10.0, abs=1e-5)  # n * (k-1) for perfect dep
    # includes the zero cells of the full grid
    assert len(rows) == 4


def test_categorical_association_independent_near_zero(spark):
    from biomedical_data_integration_spark.operators.profiling import (
        categorical_association,
    )

    rows_src = [(a, b) for a in "xy" for b in "uv" for _ in range(10)]
    df = spark.createDataFrame(rows_src, ["a", "b"])
    rows = categorical_association(df, "a", "b").collect()
    assert rows[0]["mutual_information"] == pytest.approx(0.0, abs=1e-5)
    assert rows[0]["chi_square"] == pytest.approx(0.0, abs=1e-5)


def test_streaming_sequence_examples_matches_batch(spark):
    import tempfile

    from biomedical_data_integration_spark.streaming.events import (
        streaming_sequence_examples,
    )

    rows = [(1, i, i, t) for i, t in enumerate(["v", "c", "p", "v", "s"])]
    batch = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, event_type string"
    )
    want = {
        (r["user_id"], r["ts"]): (F_join(r["context"]), r["label"])
        for r in sequence_examples(batch, context_len=3).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        # split into two files -> state must carry the deque across batches
        batch.where(F.col("ts") < 2).coalesce(1).write.parquet(f"{d}/src/p1")
        batch.where(F.col("ts") >= 2).coalesce(1).write.parquet(f"{d}/src/p2")
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/src/*")
        )
        out = streaming_sequence_examples(stream, context_len=3)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory").queryName("seq_stream_t")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True).start()
        )
        sq.awaitTermination(120)
        got = {
            (r["user_id"], r["ts"]): (r["context"], r["label"])
            for r in spark.sql("SELECT * FROM seq_stream_t").collect()
        }
    assert got == want


def test_streaming_sequence_examples_delimiter_safe(spark):
    """Items containing '|' or '\\x1f' must survive the flat context
    encoding — JSON round-trips them; the old raw join corrupted both
    the emitted context and the cross-batch state deque."""
    import json
    import tempfile

    from biomedical_data_integration_spark.streaming.events import (
        streaming_sequence_examples,
    )

    items = ["a|b", "c\x1fd", "plain"]
    rows = [(1, i, i, t) for i, t in enumerate(items)]
    batch = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, event_type string"
    )
    with tempfile.TemporaryDirectory() as d:
        # two files so the '\x1f'-bearing deque crosses a state boundary
        batch.where(F.col("ts") < 2).coalesce(1).write.parquet(f"{d}/src/p1")
        batch.where(F.col("ts") >= 2).coalesce(1).write.parquet(f"{d}/src/p2")
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/src/*")
        )
        out = streaming_sequence_examples(stream, context_len=3)
        sq = (
            out.writeStream.format("memory").queryName("seq_delim_t")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True).start()
        )
        sq.awaitTermination(120)
        got = {
            r["ts"]: (json.loads(r["context"]), r["label"])
            for r in spark.sql("SELECT * FROM seq_delim_t").collect()
        }
    assert got[1] == (["a|b"], "c\x1fd")
    assert got[2] == (["a|b", "c\x1fd"], "plain")


def F_join(ctx):
    import json

    return json.dumps(list(ctx))
