"""Benchmark harness: runs every declared query at the bench scale factor.

Runs each ``__spark_entry__.queries()`` entry on
``local[$SPARK_GRAFT_CPUS]`` against ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints TWO JSON lines — the full per-query map,
then a compact summary as the LAST line (tail-capture-proof)::

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": "..."}
    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "sf": "...", "n_queries": M, "drift_vs_prev": R}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect), which is what a cluster job would do — write out the
result, not pull it to the driver.

``drift_vs_prev`` is the HOST-DRIFT factor (round-9 verdict item 5):
the median per-query ratio t_now/t_prev over queries present in both
this run and the previous recorded run (bench_history.jsonl at the repo
root keeps each run's full per-query map — the driver's BENCH artifact
truncates it), restricted to queries slower than 0.3 s in the previous
run (sub-noise timings would dominate the median with jitter). The
median is robust to the handful of genuinely-changed queries, so a
value like 1.2 means THE HOST runs ~1.2x slower this round and
round-over-round totals should be read through it. null when no
history exists.
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

    # Untimed warmup: JVM/codegen/Arrow-path JIT and the parquet footer
    # reads otherwise land entirely on the first measured query.
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf

    for _t in ("lineitem", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{sf_dir}/{_t}.parquet").limit(1000).count()
        except Exception:
            pass
    try:
        @_pudf("string")
        def _warm(s):
            return s

        spark.range(100).select(
            _warm(_F.col("id").cast("string"))
        ).write.mode("overwrite").format("noop").save()
    except Exception:
        pass

    # Best-of-N per query: this host shows 2-3x timing noise from outside
    # the JVM (co-tenant load), and min-of-runs is the standard estimator
    # for the engine's actual cost under noise.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

    # Per-query history medians at THIS scale factor (round-11 verdict
    # item "bench drift normalization"): a row landing >1.5x its own
    # history median is far more likely co-tenant pollution than a real
    # regression on this host, so such rows earn ONE extra sample before
    # the artifact records them, and every row ships its
    # ratio-to-history-median so judges/builders read regressions
    # through the row's own baseline instead of settling by hand.
    hist_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"
    )
    hist_median: dict[str, float] = {}
    try:
        with open(hist_path) as fh:
            _hruns = [
                json.loads(ln) for ln in fh if ln.strip()
            ]
        sf_dir_ = os.environ.get("SPARK_GRAFT_SF_DIR", sf_dir)
        per_q: dict[str, list[float]] = {}
        for p in _hruns:
            if p.get("sf") != sf_dir_:
                continue
            for k, v in p.get("queries", {}).items():
                if isinstance(v, (int, float)) and v > 0:
                    per_q.setdefault(k, []).append(float(v))
        for k, vs in per_q.items():
            vs.sort()
            mid = len(vs) // 2
            hist_median[k] = (
                vs[mid] if len(vs) % 2 else (vs[mid - 1] + vs[mid]) / 2
            )
    except Exception:
        pass  # advisory — a fresh checkout has no history

    timings: dict[str, float] = {}
    ratio_to_median: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():

        def one_run():
            # Clear persisted intermediates so every run pays its own
            # persist cost (no silent cache reuse between runs) and cached
            # blocks don't pile up in the heap across the 30-query session.
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            return round(time.monotonic() - t0, 3)

        samples: list[float] = []
        best = None
        try:
            for _ in range(runs):
                samples.append(one_run())
            # Estimator hardening (round-11 verdict item 6): when the
            # first two timings disagree by >1.5x, one of them was
            # polluted by co-tenant load — min-of-2 can still pick a
            # bad pair's lesser evil. A third sample lets min reject a
            # single polluted run outright.
            if (
                len(samples) >= 2
                and min(samples) > 0
                and max(samples) / min(samples) > 1.5
            ):
                samples.append(one_run())
            best = min(samples)
            # Auto-retime vs the row's OWN history median (verdict r11
            # item 7): a row >1.5x its median is co-tenant pollution
            # until proven otherwise — one extra sample lets min()
            # discard it, so artifact rows stay within ~1.2x of a
            # quiet-host retime without manual settling. Only rows with
            # a meaningful baseline (median > 0.3 s) qualify; sub-noise
            # rows would retime forever on jitter.
            med = hist_median.get(name)
            if med is not None and med > 0.3 and best > 1.5 * med:
                samples.append(one_run())
                best = min(samples)
            if med is not None and med > 0:
                ratio_to_median[name] = round(best / med, 3)
        except Exception as e:  # record the failure, keep benching the rest
            print(f"# bench FAIL {name}: {e}", file=sys.stderr)
            best = -1.0
        timings[name] = best
        # bound driver-heap creep (unreferenced broadcast/shuffle state is
        # only reclaimed on GC, and an idle 16g heap rarely collects)
        spark.sparkContext._jvm.System.gc()
        if best >= 0:
            total += best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    # Host-drift factor vs the previous recorded run (tools/retime.py's
    # untouched-median method, emitted in-artifact per verdict r9 item 5)
    drift, drift_n, prev_total = None, 0, None
    try:
        with open(hist_path) as fh:
            lines = [ln for ln in fh if ln.strip()]
        # most recent prior run AT THIS SCALE FACTOR (local sf0.001/sf0.01
        # smoke runs must not pollute the sf0.1 driver comparison)
        prev = next(
            (
                p
                for p in (json.loads(ln) for ln in reversed(lines))
                if p.get("sf") == sf_dir
            ),
            None,
        )
        if prev is not None:
            prev_q = prev.get("queries", {})
            prev_total = prev.get("value")
            ratios = sorted(
                timings[k] / prev_q[k]
                for k in timings
                if k in prev_q and prev_q[k] > 0.3 and timings[k] > 0
            )
            drift_n = len(ratios)
            if drift_n:
                mid = drift_n // 2
                drift = round(
                    ratios[mid]
                    if drift_n % 2
                    else (ratios[mid - 1] + ratios[mid]) / 2,
                    3,
                )
    except Exception as e:  # history is advisory — never fail the bench
        print(f"# drift computation skipped: {e}", file=sys.stderr)

    summary_extra = {
        "drift_vs_prev": drift,
        "drift_n_queries": drift_n,
        "prev_total": prev_total,
    }

    # Two lines, detail first: the driver captures a fixed-size TAIL of
    # stdout, and the per-query map has outgrown it (r2's total was cut
    # off and failed to parse). The compact summary goes LAST so it always
    # survives; the full per-query map rides the line before it.
    detail = {
        "metric": "total_query_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # each row's ratio to its own bench-history median at this sf —
        # the per-row drift readout (rows without history are absent)
        "ratio_to_median": ratio_to_median,
        "sf": sf_dir,
        "runs_per_query": runs,
        "estimator": "min",
        **summary_extra,
    }
    print(json.dumps(detail))
    # Also persist the full per-query map to a file: the 261-entry detail
    # line outgrew the driver's stdout tail capture in round 12
    # (PERF_r12 per_query came back empty), so the driver/judge can read
    # bench_last.json instead of re-parsing stdout.
    try:
        last_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_last.json"
        )
        tmp = last_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(detail, fh, indent=1)
        os.replace(tmp, last_path)
    except Exception as e:
        print(f"# bench_last.json write skipped: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf_dir,
                "n_queries": len(timings),
                "runs_per_query": runs,
                "estimator": "min",
                **summary_extra,
            }
        )
    )
    # append this run's full map so the NEXT run can compute its drift,
    # then ROTATE: keep only the last 5 runs per scale factor so local
    # sf0.001/sf0.01 smoke runs can't grow the committed history without
    # bound (ADVICE r10 item 3)
    try:
        with open(hist_path, "a") as fh:
            fh.write(json.dumps(detail) + "\n")
        with open(hist_path) as fh:
            entries = [json.loads(ln) for ln in fh if ln.strip()]
        keep_per_sf = 5
        kept: list = []
        seen: dict[str, int] = {}
        for p in reversed(entries):
            k = p.get("sf", "?")
            if seen.get(k, 0) < keep_per_sf:
                kept.append(p)
                seen[k] = seen.get(k, 0) + 1
        kept.reverse()
        if len(kept) < len(entries):
            # atomic rewrite (ADVICE r11): a crash mid-rewrite must not
            # truncate the committed history — write aside, then one
            # os.replace (atomic on POSIX) swaps it in
            tmp = hist_path + ".tmp"
            with open(tmp, "w") as fh:
                for p in kept:
                    fh.write(json.dumps(p) + "\n")
            os.replace(tmp, hist_path)
    except Exception as e:
        print(f"# history append skipped: {e}", file=sys.stderr)
    return 1 if any(v < 0 for v in timings.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
