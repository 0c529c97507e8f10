"""Measure the bucketed two-pass prefix sum (functions/prefix.py)
against the single-task ordered window it replaced, at growing
distinct-value cardinality (the round-7 verdict's rank-stats
scale-killer: Window.orderBy with no partition key = one executor core
sorts the whole distinct-value table).

Usage: python tools/bench_prefix_sums.py [reps]
Prints one line per (n_distinct, kernel): median wall seconds.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from biomedical_data_integration_spark.functions.prefix import (  # noqa: E402
    exclusive_prefix_sums,
)


def naive(df, order_col, sum_cols):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w), F.lit(0)).alias(f"{c}_xps")
            for c in sum_cols
        ],
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in (100_000, 1_000_000, 10_000_000):
        # distinct bigint keys with per-key counts — the post-groupBy
        # shape every rank statistic feeds into the cumulative sum
        base = (
            spark.range(n)
            .select(
                F.col("id").alias("__v"),
                (F.col("id") % 13 + 1).cast("bigint").alias("__t"),
            )
            .persist()
        )
        base.count()
        for name, fn in (
            ("window", lambda d: naive(d, "__v", ["__t"])),
            ("bucketed", lambda d: exclusive_prefix_sums(d, "__v", ["__t"])),
        ):
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                # checksum forces every row through the cumsum
                fn(base).agg(F.sum(F.col("__t_xps") % 97)).collect()
                times.append(time.perf_counter() - t0)
            print(
                f"n={n:>9,}  {name:>8}  median={statistics.median(times):7.3f}s"
                f"  all={[round(t, 3) for t in times]}"
            )
        base.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
