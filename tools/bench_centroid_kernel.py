"""Measure the centroid-assignment kernels: literal inlined folds vs
broadcast-join higher-order fold, across k, on the real embeddings
tables. Informs planning.CENTROID_LITERAL_LIMIT (PERF_NOTES entry).

Usage: python tools/bench_centroid_kernel.py [sf_dir] [k ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from biomedical_data_integration_spark import planning
from biomedical_data_integration_spark.operators import clustering


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(x) for x in sys.argv[2:]] or [4, 8, 16, 20, 64, 200]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    print(f"n={n} vectors, sf={sf_dir}")
    for k in ks:
        if k > n:
            continue
        for kernel in ("literal", "join"):
            orig = planning.CENTROID_LITERAL_LIMIT
            planning.CENTROID_LITERAL_LIMIT = 10**9 if kernel == "literal" else 0
            try:
                t0 = time.time()
                out, _ = clustering.kmeans(
                    emb, "embedding", "vec_id", k=k, max_iter=3
                )
                rows = out.count()
                dt = time.time() - t0
                per_rowk = dt / (n * k) * 1e6
                print(
                    f"k={k:5d} kernel={kernel:7s} fit+assign={dt:6.2f}s "
                    f"rows={rows} us/(row*k)={per_rowk:.3f}"
                )
            finally:
                planning.CENTROID_LITERAL_LIMIT = orig
    spark.stop()


if __name__ == "__main__":
    main()
