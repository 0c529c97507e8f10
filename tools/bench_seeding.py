"""maxmin vs k-means‖ seeding cost as k grows (round-7 verdict item 4:
maxmin is k-1 sequential driver round-trips; parallel must be ~flat).

Counts Spark JOBS (the round-trip unit) via the status tracker and
times the seeding-only fit (max_iter=0 assignment excluded by timing
the seed function through kmeans max_iter=0).

Usage: python tools/bench_seeding.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from biomedical_data_integration_spark.operators.clustering import (  # noqa: E402
    kmeans,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()
    tracker = spark.sparkContext.statusTracker()
    print(f"{'k':>4} {'init':>9} {'jobs':>5} {'sec':>7}")
    for k in (5, 20, 50):
        for init in ("maxmin", "parallel"):
            before = len(tracker.getJobIdsForGroup())
            t0 = time.perf_counter()
            kmeans(emb, k=k, max_iter=0, init=init)
            dt = time.perf_counter() - t0
            after = len(tracker.getJobIdsForGroup())
            print(f"{k:>4} {init:>9} {after - before:>5} {dt:>7.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
