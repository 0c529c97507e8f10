"""Z-order layout: key correctness, null handling, and the actual
data-skipping payoff measured from parquet file statistics."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.layout import (
    repartition_zorder,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    # 2 columns, 2 bits: corners of the unit square get classic morton codes
    rows = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (1.0, 2.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {
        (r["x"], r["y"]): r["z_key"]
        for r in zorder_key(df, ["x", "y"], bits=2).collect()
    }
    # buckets = values (range 0..3 maps onto 0..3); x contributes bits
    # 0 and 2, y contributes bits 1 and 3
    def morton(bx, by):
        return (
            (bx & 1) | ((by & 1) << 1) | (((bx >> 1) & 1) << 2)
            | (((by >> 1) & 1) << 3)
        )

    assert out[(0.0, 0.0)] == morton(0, 0) == 0
    assert out[(3.0, 0.0)] == morton(3, 0) == 5
    assert out[(0.0, 3.0)] == morton(0, 3) == 10
    assert out[(3.0, 3.0)] == morton(3, 3) == 15
    assert out[(1.0, 2.0)] == morton(1, 2) == 9


def test_zorder_key_nulls_and_degenerate_range(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (None, 5.0), (2.0, 5.0)], "x double, y double"
    )
    out = {r["x"]: r["z_key"] for r in
           zorder_key(df, ["x", "y"], bits=4).collect()}
    assert out[None] == -1           # null rows cluster at key -1
    # y is constant (max == min) -> bucket 0, contributes no bits
    assert out[1.0] == 0             # x at min -> bucket 0
    assert out[2.0] > 0


def test_zorder_key_rejects_bad_args(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="column"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="bits"):
        zorder_key(df, ["x"], bits=63)


def test_repartition_zorder_narrows_both_dims(spark):
    # grid data: clustering by x alone would leave y spans full-range
    rows = [(float(i % 32), float(i // 32)) for i in range(1024)]
    df = spark.createDataFrame(rows, "x double, y double")

    def mean_spans(pdf_iterable):
        spans = []
        for part in pdf_iterable:
            if part:
                xs = [r["x"] for r in part]
                ys = [r["y"] for r in part]
                spans.append(((max(xs) - min(xs)) + (max(ys) - min(ys))) / 2)
        return sum(spans) / len(spans)

    z = repartition_zorder(df, ["x", "y"], n_partitions=16, bits=5)
    z_spans = mean_spans(z.rdd.glom().map(list).collect())
    x_sorted = df.repartitionByRange(16, F.col("x"))
    x_spans = mean_spans(x_sorted.rdd.glom().map(list).collect())
    # z-order keeps BOTH dims narrow; single-column range keeps only x
    assert z_spans < x_spans * 0.55


def test_zorder_parquet_file_skipping(spark, tmp_path):
    import pyarrow.parquet as pq

    rows = [(float(i % 64), float(i // 64)) for i in range(4096)]
    df = spark.createDataFrame(rows, "x double, y double")
    path = str(tmp_path / "zordered")
    repartition_zorder(df, ["x", "y"], n_partitions=16, bits=6) \
        .write.mode("overwrite").parquet(path)

    import glob
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) >= 8

    def files_matching(col, v):
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(
                    [c.path_in_schema for c in
                     [md.row_group(rg).column(i)
                      for i in range(md.row_group(rg).num_columns)]]
                    .index(col)).statistics
                if st.min <= v <= st.max:
                    hit += 1
                    break
        return hit

    # a point predicate on EITHER dimension prunes most files
    for col in ("x", "y"):
        assert files_matching(col, 7.0) <= len(files) // 2, col


def test_zorder_quantile_beats_minmax_under_skew(spark):
    # heavy-tail y: the mass sits in [0, 1) with rare 1e6 outliers, so
    # min-max buckets cram every normal row into bucket 0 and the y
    # dimension stops pruning entirely; rank-based buckets stay
    # equal-mass and keep in-mass points prunable
    rows = [
        (float(i % 32),
         1e6 if i % 512 == 0 else (i % 100) * 0.01)
        for i in range(2048)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    median_y = 0.5

    def parts_containing(layout, v):
        parts = layout.rdd.glom().map(list).collect()
        return sum(
            1 for p in parts
            if p and min(r["y"] for r in p) <= v <= max(r["y"] for r in p)
        )

    from biomedical_data_integration_spark.operators.layout import (
        repartition_zorder,
    )

    mm = repartition_zorder(df, ["x", "y"], 16, bits=5)
    qt = repartition_zorder(df, ["x", "y"], 16, bits=5,
                            boundaries="quantile")
    assert parts_containing(qt, median_y) < parts_containing(mm, median_y)


def test_zorder_quantile_rejects_large_bits(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    from biomedical_data_integration_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="quantile"):
        zorder_key(df, ["x", "y"], bits=12, boundaries="quantile")
