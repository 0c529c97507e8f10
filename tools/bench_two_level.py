"""Flat vs two-level SemDeDup as the corpus grows — evidences the
O(n·k) vs O(n·√k) assignment claim (PERF_NOTES). Builds 1x/Nx unions of
the sf embeddings (fresh vec_ids so auto-k sees the larger corpus) and
times both paths end-to-end.

Usage: python tools/bench_two_level.py [sf_dir] [multipliers...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.clustering import (
    semantic_dedup,
    semantic_dedup_two_level,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(x) for x in sys.argv[2:]] or [1, 4, 10]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n0 = emb.count()
    for m in mults:
        parts = []
        for i in range(m):
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * n0)).alias("vec_id"),
                    # shift copies slightly so they aren't exact dups of
                    # the originals (keeps the pair-join output sane)
                    F.transform(
                        "embedding", lambda x: x + F.lit(float(i)) * 0.001
                    ).alias("embedding"),
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.union(p)
        df = df.localCheckpoint(eager=True)
        n = df.count()
        for name, fn in (
            ("flat", lambda d: semantic_dedup(d, k=None, max_iter=2,
                                              target_cluster_size=100)),
            ("two_level", lambda d: semantic_dedup_two_level(
                d, max_iter=2, target_cluster_size=100)),
        ):
            t0 = time.time()
            rows = fn(df).count()
            dt = time.time() - t0
            print(f"n={n:7d} (x{m}) {name:10s} {dt:7.2f}s survivors={rows}")
    spark.stop()


if __name__ == "__main__":
    main()
