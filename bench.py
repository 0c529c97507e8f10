"""Benchmark harness: runs every declared query at the bench scale factor.

Runs each ``__spark_entry__.queries()`` entry on
``local[$SPARK_GRAFT_CPUS]`` against ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line::

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": "..."}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect), which is what a cluster job would do — write out the
result, not pull it to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
        except Exception as e:  # record the failure, keep benching the rest
            print(f"# bench FAIL {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = round(time.monotonic() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    return 1 if any(v < 0 for v in timings.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
