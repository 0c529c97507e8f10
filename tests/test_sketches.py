"""Tests for operators/sketches.py (count-min + KMV)."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.sketches import (
    cms_estimate,
    countmin_sketch,
    kmv_distinct,
)


def _words(spark, counts):
    rows = []
    i = 0
    for w, n in counts.items():
        for _ in range(n):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "id bigint, w string")


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    counts = {"apple": 40, "banana": 25, "cherry": 3, "durian": 1}
    df = _words(spark, counts)
    sk = countmin_sketch(df, "w", width=256, depth=4)
    est = {
        r["w"]: r["est_count"]
        for r in cms_estimate(sk, df, "w", width=256, depth=4).collect()
    }
    for w, n in counts.items():
        assert est[w] >= n  # CMS guarantee
        # 69 items in 256*4 cells: collisions essentially impossible
        assert est[w] == n


def test_cms_absent_item_estimates_zero_when_sparse(spark):
    df = _words(spark, {"only": 5})
    sk = countmin_sketch(df, "w", width=1024, depth=4)
    probe = spark.createDataFrame([("missing",)], "w string")
    est = cms_estimate(sk, probe, "w", width=1024, depth=4).collect()[0]
    assert est["est_count"] == 0


def test_cms_sketches_merge_by_counter_addition(spark):
    a = _words(spark, {"x": 10, "y": 2})
    b = _words(spark, {"x": 5, "z": 7})
    both = a.unionByName(b)
    merged = (
        countmin_sketch(a, "w", width=128, depth=3)
        .unionByName(countmin_sketch(b, "w", width=128, depth=3))
        .groupBy("depth", "pos")
        .agg(F.sum("count").alias("count"))
    )
    direct = countmin_sketch(both, "w", width=128, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_exact_below_k(spark):
    df = _words(spark, {f"w{i}": 2 for i in range(10)})
    out = kmv_distinct(df, "w", k=64).collect()[0]
    assert out["n_kept"] == 10
    assert out["distinct_estimate"] == 10.0


def test_kmv_estimates_within_tolerance(spark):
    df = spark.range(0, 5000).select(F.concat(F.lit("v"), F.col("id")).alias("w"))
    out = kmv_distinct(df, "w", k=256).collect()[0]
    assert out["n_kept"] == 256
    # KMV relative error ~ 1/sqrt(k-2) ~ 6%; allow 3 sigma
    assert abs(out["distinct_estimate"] - 5000) / 5000 < 0.2


def test_kmv_deterministic(spark):
    df = spark.range(0, 1000).select(F.concat(F.lit("v"), F.col("id")).alias("w"))
    a = kmv_distinct(df, "w", k=32).collect()[0]
    b = kmv_distinct(df.repartition(7), "w", k=32).collect()[0]
    assert tuple(a) == tuple(b)  # partitioning-independent


def test_sketch_param_validation(spark):
    df = _words(spark, {"a": 1})
    with pytest.raises(ValueError):
        countmin_sketch(df, "w", width=0)
    with pytest.raises(ValueError):
        kmv_distinct(df, "w", k=1)


def test_streaming_countmin_snapshot_equals_batch(spark):
    import tempfile

    from biomedical_data_integration_spark.operators.sketches import (
        streaming_countmin,
    )

    df = _words(spark, {"x": 12, "y": 4, "z": 1})
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        df.write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = streaming_countmin(stream, "w", width=64, depth=3)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("cms_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = sorted(
            map(tuple, spark.sql("select * from cms_stream").collect())
        )
    want = sorted(
        map(tuple, countmin_sketch(df, "w", width=64, depth=3).collect())
    )
    assert got == want


# property: CMS never underestimates, on arbitrary word multisets
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdefg", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=20),
        min_size=1,
        max_size=12,
    )
)
def test_cms_overestimate_property(spark, counts):
    df = _words(spark, counts)
    sk = countmin_sketch(df, "w", width=32, depth=3)
    est = {
        r["w"]: r["est_count"]
        for r in cms_estimate(sk, df, "w", width=32, depth=3).collect()
    }
    assert all(est[w] >= n for w, n in counts.items())


def test_histogram_sketch_merge_and_quantiles(spark):
    from biomedical_data_integration_spark.operators.sketches import (
        histogram_merge,
        histogram_quantiles,
        histogram_sketch,
    )

    rows_a = [(float(i),) for i in range(0, 500)]
    rows_b = [(float(i),) for i in range(500, 1000)]
    a = spark.createDataFrame(rows_a, "v double")
    b = spark.createDataFrame(rows_b, "v double")
    full = spark.createDataFrame(rows_a + rows_b, "v double")

    LO, HI, BINS = 0.0, 1000.0, 100
    sa = histogram_sketch(a, "v", BINS, LO, HI)
    sb = histogram_sketch(b, "v", BINS, LO, HI)
    merged = {r["bin"]: r["n"] for r in histogram_merge(sa, sb).collect()}
    direct = {r["bin"]: r["n"]
              for r in histogram_sketch(full, "v", BINS, LO, HI).collect()}
    assert merged == direct           # partition merge == full recompute
    assert sum(merged.values()) == 1000

    qs = histogram_quantiles(
        histogram_sketch(full, "v", BINS, LO, HI), [0.5, 0.9, 0.99],
        LO, HI, BINS,
    )
    got = {r["q"]: r["value"] for r in qs.collect()}
    # half-bucket-width (5.0) error bound vs the exact quantiles
    assert abs(got[0.5] - 500.0) <= 5.0 + 1.0
    assert abs(got[0.9] - 900.0) <= 5.0 + 1.0
    assert abs(got[0.99] - 990.0) <= 5.0 + 1.0


def test_histogram_sketch_clamps_out_of_range(spark):
    from biomedical_data_integration_spark.operators.sketches import (
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (99.0,), (250.0,)], "v double"
    )
    got = {r["bin"]: r["n"]
           for r in histogram_sketch(df, "v", 10, 0.0, 100.0).collect()}
    assert got[0] == 2     # -5 clamps into bucket 0, 0.5 lands there
    assert got[9] == 2     # 99 in the top bucket; 250 clamps into it


def test_streaming_histogram_snapshot_equals_batch(spark):
    import tempfile

    from biomedical_data_integration_spark.operators.sketches import (
        histogram_sketch,
        streaming_histogram,
    )

    rows = [(float(i % 100),) for i in range(400)]
    df = spark.createDataFrame(rows, "v double")
    want = {r["bin"]: r["n"]
            for r in histogram_sketch(df, "v", 20, 0.0, 100.0).collect()}
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(2).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(df.schema).parquet(f"{d}/src")
        out = streaming_histogram(stream, "v", 20, 0.0, 100.0)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory").queryName("hist_stream_test")
            .outputMode("complete")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True).start()
        )
        sq.awaitTermination(120)
        got = {r["bin"]: r["n"]
               for r in spark.sql("SELECT * FROM hist_stream_test").collect()}
    assert got == want


def test_kmv_intersect_exact_under_k(spark):
    from biomedical_data_integration_spark.operators.sketches import kmv_intersect

    a = spark.createDataFrame([(i,) for i in range(20)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(10, 30)], ["v"])
    row = kmv_intersect(a, b, "v", k=64).collect()[0]
    # union of 30 values fits under k -> everything exact
    assert row["n_kept"] == 30
    assert row["union_estimate"] == 30.0
    assert row["n_both"] == 10
    assert row["intersect_estimate"] == 10.0
    assert abs(row["jaccard_estimate"] - 10.0 / 30.0) < 1e-6


def test_kmv_intersect_estimates_above_k(spark):
    from biomedical_data_integration_spark.operators.sketches import kmv_intersect

    a = spark.createDataFrame([(i,) for i in range(1000)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(500, 1500)], ["v"])
    row = kmv_intersect(a, b, "v", k=128).collect()[0]
    assert row["n_kept"] == 128
    # true union 1500, intersection 500, jaccard 1/3 — sketch within ~35%
    assert 1000 < row["union_estimate"] < 2100
    assert 0.15 < row["jaccard_estimate"] < 0.55
    assert 250 < row["intersect_estimate"] < 850


def test_kmv_intersect_disjoint_sets(spark):
    from biomedical_data_integration_spark.operators.sketches import kmv_intersect

    a = spark.createDataFrame([(i,) for i in range(50)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(100, 150)], ["v"])
    row = kmv_intersect(a, b, "v", k=256).collect()[0]
    assert row["n_both"] == 0
    assert row["intersect_estimate"] == 0.0


def test_kmv_intersect_merge_determinism(spark):
    """Same data partitioned differently -> identical sketch read-out."""
    from biomedical_data_integration_spark.operators.sketches import kmv_intersect

    a1 = spark.createDataFrame([(i,) for i in range(300)], ["v"])
    a2 = a1.repartition(7)
    b = spark.createDataFrame([(i,) for i in range(150, 450)], ["v"])
    r1 = kmv_intersect(a1, b, "v", k=64).collect()[0]
    r2 = kmv_intersect(a2, b, "v", k=64).collect()[0]
    assert r1 == r2


def test_hll_sketch_registers_deterministic_and_bounded(spark):
    from biomedical_data_integration_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    df = spark.createDataFrame([(i,) for i in range(5000)], "id bigint")
    regs = hll_sketch(df, "id", p=8)
    pdf = regs.toPandas()
    assert len(pdf) <= 256
    assert (pdf["register"] >= 0).all() and (pdf["register"] <= 255).all()
    assert (pdf["rho"] >= 1).all() and (pdf["rho"] <= 53).all()
    # determinism: same input -> identical registers
    pdf2 = hll_sketch(df, "id", p=8).toPandas()
    assert sorted(map(tuple, pdf.values.tolist())) == sorted(
        map(tuple, pdf2.values.tolist())
    )
    est = hll_estimate(regs, 8).collect()[0]
    # standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est["estimate"] - 5000) / 5000 < 0.2
    # merge with itself is idempotent
    merged = hll_merge(regs, regs)
    est2 = hll_estimate(merged, 8).collect()[0]
    assert est2["estimate"] == est["estimate"]


def test_hll_merge_equals_union_sketch(spark):
    from biomedical_data_integration_spark.operators.sketches import (
        hll_merge,
        hll_sketch,
    )

    a = spark.createDataFrame([(i,) for i in range(1000)], "id bigint")
    b = spark.createDataFrame([(i,) for i in range(500, 1500)], "id bigint")
    u = a.unionByName(b)
    merged = sorted(
        map(tuple, hll_merge(hll_sketch(a, "id"), hll_sketch(b, "id")).toPandas().values.tolist())
    )
    direct = sorted(map(tuple, hll_sketch(u, "id").toPandas().values.tolist()))
    assert merged == direct


def test_hll_small_range_uses_linear_counting(spark):
    from biomedical_data_integration_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    df = spark.createDataFrame([(i,) for i in range(20)], "id bigint")
    est = hll_estimate(hll_sketch(df, "id", p=10), 10).collect()[0]
    # linear counting is near-exact at this occupancy
    assert abs(est["estimate"] - 20) < 2
    assert est["nonzero"] <= 20


def test_streaming_hll_snapshot_equals_batch(spark):
    import tempfile

    from biomedical_data_integration_spark.operators.sketches import (
        hll_sketch,
        streaming_hll,
    )

    df = spark.createDataFrame([(i % 700,) for i in range(2000)], "id bigint")
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/in", f"{d}/ckpt"
        df.write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = streaming_hll(stream, "id", p=8)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory")
            .queryName("hll_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        sq.processAllAvailable()
        sq.stop()
        got = sorted(
            map(tuple, spark.sql("select * from hll_stream").collect())
        )
    want = sorted(map(tuple, hll_sketch(df, "id", p=8).collect()))
    assert got == want


def test_hll_grouped_rollup_equals_regrouped_sketch(spark):
    from biomedical_data_integration_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_sketch,
        hll_sketch_grouped,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 7, i % 400) for i in range(3000)], "day int, uid bigint"
    )
    per_day = hll_sketch_grouped(df, "uid", ["day"], p=8)
    est = {
        r["day"]: r["estimate"]
        for r in hll_estimate_grouped(per_day, 8, ["day"]).collect()
    }
    assert len(est) == 7
    # re-max daily registers across days == global sketch (rollup trick)
    total = per_day.groupBy("register").agg(F.max("rho").alias("rho"))
    want = sorted(map(tuple, hll_sketch(df, "uid", p=8).collect()))
    got = sorted(map(tuple, total.collect()))
    assert got == want


def test_hll_wau_tracks_exact_sliding_uniques(spark):
    """Re-maxed daily registers estimate the trailing-window uniques
    within HLL error (~1.04/sqrt(m))."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_sketch_grouped,
    )
    from biomedical_data_integration_spark.streaming.events import (
        sliding_active_users,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = 10
    staged = events.select(F.to_date("ts").alias("d"), "user_id")
    regs = hll_sketch_grouped(staged, "user_id", ["d"], p=p)
    shifted = regs.select(
        F.explode(F.array(*[F.lit(k) for k in range(7)])).alias("k"),
        "d", "register", "rho",
    ).select(F.date_add("d", F.col("k")).alias("d"), "register", "rho")
    # clip like sliding_active_users: no window-end days past the data
    bound = staged.agg(F.max("d").alias("__max_d"))
    merged = (
        shifted.join(F.broadcast(bound))
        .where(F.col("d") <= F.col("__max_d"))
        .drop("__max_d")
        .groupBy("d", "register")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    est = {
        str(r["d"]): r["estimate"]
        for r in hll_estimate_grouped(merged, p, ["d"]).collect()
    }
    exact = {
        str(r["day"]): r["active_users"]
        for r in sliding_active_users(events, window_days=7).collect()
    }
    assert set(est) == set(exact)
    for day, n in exact.items():
        assert abs(est[day] - n) / n < 0.10, (day, est[day], n)
