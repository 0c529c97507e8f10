"""Scale-credibility spot check (round-13 VERDICT item 9): run the most
expensive registry faces against a 10x-materialized corpus at TWO core
counts (32 and 8) and report the 8c/32c ratio per face.

Why: at sf0.1 the bench is overhead-bound (8 cores beat 32 on total in
round 12), so sf0.1 cannot demonstrate data-path parallelism. At 10x
the data-bound faces should show ratios approaching the core ratio
(4x), while driver-bound faces stay near 1 — each face's ratio is the
evidence for which regime it is in.

Usage: python tools/bench_scale_cores.py [sf_dir] [mult]
Writes scaled tables to a temp dir (removed afterwards), prints a
per-face table. Each core count runs in its own subprocess-fresh
session via SPARK_GRAFT_SCALE_CORES_WORKER dispatch.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = os.environ.get(
    "SCALE_CORES_QUERIES",
    "dedup_keep_best_documents,"
    "dedup_clusters_documents,"
    "schema_match_distribution_orders_lineitem,"
    "schema_match_distribution_approx,"
    "semantic_dedup_two_level_embeddings,"
    "bm25_upsert_docs_documents,"
    "max_coverage_documents,"
    "harmonize_end_to_end,"
    "set_similarity_ppjoin_documents,"
    "train_hashed_classifier_documents",
).split(",")


def worker(out_dir: str, cpus: int) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    # untimed warmup on the scaled dir's smallest table
    for t in ("documents", "embeddings", "lineitem"):
        try:
            spark.read.parquet(f"{out_dir}/{t}.parquet").limit(1000).count()
        except Exception:
            pass
    out = {}
    for q in QUERIES:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = qs[q](spark, out_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.monotonic() - t0, 2)
            best = dt if best is None else min(best, dt)
        out[q] = best
        print(f"# c{cpus} {q}: {best:.2f}s", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": cpus, "queries": out}))


def main() -> None:
    if os.environ.get("SPARK_GRAFT_SCALE_CORES_WORKER"):
        worker(sys.argv[1], int(sys.argv[2]))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession

    import bench_scale_sweep as sweep

    out_dir = tempfile.mkdtemp(prefix=f"scale_cores_{mult}x_")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for t in sweep.TABLES:
            n = sweep._scaled(spark, sf_dir, t, mult, out_dir)
            print(f"# scaled {t}: {n} rows", file=sys.stderr, flush=True)
        spark.stop()
        results = {}
        for cpus in (32, 8):
            env = dict(os.environ)
            env["SPARK_GRAFT_SCALE_CORES_WORKER"] = "1"
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), out_dir, str(cpus)],
                env=env, capture_output=True, text=True,
            )
            sys.stderr.write(p.stderr[-4000:])
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
            results[cpus] = json.loads(line)["queries"]
        print(f"\nface, t_32c, t_8c, ratio_8c_over_32c  ({mult}x of {sf_dir})")
        for q in QUERIES:
            t32, t8 = results[32].get(q), results[8].get(q)
            r = t8 / t32 if t32 else float("nan")
            print(f"{q}, {t32:.2f}, {t8:.2f}, {r:.2f}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
