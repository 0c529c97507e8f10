"""Degenerate-input sweep: run every registry query against EMPTY copies
of the test tables and classify the outcome. Guard-raised ValueErrors
(documented preconditions like "need at least k rows") are fine;
ArithmeticException / DIVIDE_BY_ZERO are latent ANSI-mode bugs of the
class hypothesis caught in js_divergence/mann_whitney.

Usage: python tools/empty_input_sweep.py [sf_dir] [n_rows]
(n_rows defaults to 0; pass 1 for the single-row / n-1 == 0 class)
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix=f"degen{n_rows}_sf_")
    for t in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df.limit(n_rows).write.mode("overwrite").parquet(
            os.path.join(tmp, f"{t}.parquet")
        )
    ok = guard = arith = other = 0
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, tmp).count()
            ok += 1
        except ValueError as e:
            guard += 1
            print(f"GUARD {name}: {e}")
        except Exception as e:
            msg = "".join(traceback.format_exception_only(type(e), e))
            if "DIVIDE_BY_ZERO" in msg or "ArithmeticException" in msg:
                arith += 1
                print(f"ARITH {name}: {msg.splitlines()[0][:160]}")
            else:
                other += 1
                print(f"OTHER {name}: {msg.splitlines()[0][:160]}")
    print(f"\nok={ok} guard={guard} arith={arith} other={other}")
    spark.stop()


if __name__ == "__main__":
    main()
