"""The driver's correctness gate, automated: every __spark_entry__
queries() entry vs its oracle_sql() DuckDB recomputation at sf0.001.

This mirrors what the round driver does at sf0.01 (CORRECTNESS_r{N}.json):
row count + column names + order-insensitive canonical values.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, canon  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("BDI_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


def test_every_query_has_an_oracle_or_documented_exemption():
    # every registry query is SQL-oracled — no rows-only exemptions left
    assert set(QUERIES) - set(ORACLES) == set()


def _source_dict_keys(func_name):
    """String keys of the dict literal returned by ``func_name`` in
    __spark_entry__.py, read from the SOURCE (ast) — a duplicate key in
    the literal silently merges (first position, last value) before any
    runtime check can see it, so `list(queries())` cannot guard this."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(entrymod))
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            for ret in ast.walk(node):
                if isinstance(ret, ast.Return) and isinstance(
                    ret.value, ast.Dict
                ):
                    return [
                        k.value
                        for k in ret.value.keys
                        if isinstance(k, ast.Constant)
                    ]
    raise AssertionError(f"no dict-literal return found in {func_name}")


def test_no_duplicate_keys_in_source():
    """A repeated key in the queries()/oracle_sql() dict literal would
    silently shadow an earlier entry — check the source, not the dict."""
    for fn in ("queries", "oracle_sql"):
        keys = _source_dict_keys(fn)
        dupes = sorted({k for k in keys if keys.count(k) > 1})
        assert not dupes, f"duplicate keys in {fn}() literal: {dupes}"


def test_graded_window_shape(spark):
    """Guard the FIRST-50 graded window's shape (round-6 verdict item 3):
    the driver's value-hash compares canonicalized cell values, and
    array-typed output columns hashed unreliably there once
    (feature_hash_orders, round 5) — rotation must never silently
    un-grade a query by moving an array-shaped result into the window.
    Window entries must all carry an oracle."""
    names = list(QUERIES)
    window = names[:50]
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql.types import ArrayType, MapType

    for name in window:
        assert name in ORACLES, f"window query {name} lacks an oracle"

    def bad_cols(name):
        df = QUERIES[name](spark, SF_DIR)
        return [
            f"{name}.{f.name}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]

    with ThreadPoolExecutor(max_workers=8) as ex:
        offenders = [o for sub in ex.map(bad_cols, window) for o in sub]
    assert not offenders, f"array/map-typed columns in graded window: {offenders}"


def test_graded_window_is_mechanical_rotation():
    """The round-12 window must be exactly what tools/next_window.py
    derives from the CORRECTNESS_r01..r11 history (never-driver-graded
    first in registry order, then ascending last-graded round tie-broken
    by file position) — rotation is mechanical, not hand-ordered. The
    history is PINNED to the r01–r11 files the round-12 window was
    emitted from, so this guard stays green after the driver writes
    newer CORRECTNESS files; round 13 re-pins when it re-rotates."""
    import glob
    import importlib.util
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "next_window", os.path.join(repo, "tools", "next_window.py")
    )
    nw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(nw)
    pinned = sorted(
        f
        for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if int(re.search(r"r(\d+)", os.path.basename(f)).group(1)) <= 11
    )
    assert len(pinned) == 11, "expected the r01..r11 history files"
    # registry pinned to what existed when the window was emitted:
    # ever-driver-graded names plus the window itself (queries added
    # AFTER the rotation land in the tail and lead the NEXT rotation)
    hist = nw.history(files=pinned)
    names = list(QUERIES)
    emission_registry = [n for n in names if n in hist or n in names[:50]]
    expected = nw.rotated(files=pinned, registry=emission_registry)[:50]
    assert names[:50] == expected


# Longest-processing-time-first order for the replica's thread pool:
# these rows dominate (measured round 13: corpus_curation_v4's DuckDB
# replay alone is ~127 s; the IVFPQ family ~25-37 s each on the Spark
# side) — started last they become the wall-clock tail, started first
# they overlap everything else.
_HEAVY_FIRST = [
    "corpus_curation_v4_end_to_end",
    "quality_probe_persisted_documents",
    "quality_warmstart_classifier_documents",
    "ivfpq_upsert_vectors_embeddings",
    "unigram_vocab_documents",
    "unigram_encode_documents",
    "unigram_encode_persisted_documents",
    "semantic_dedup_two_level_embeddings",
    "ivfpq_compact_index_embeddings",
    "ivfpq_incremental_index_embeddings",
    "hashed_warmstart_classifier_documents",
    "ivfpq_delete_ids_embeddings",
    "ivfpq_persist_index_embeddings",
    "pq_topk_embeddings",
    "ivfpq_topk_embeddings",
    "train_quality_classifier_documents",
    "train_hashed_classifier_documents",
    "corpus_curation_v3_end_to_end",
]


def _lpt_order(names):
    heavy = [n for n in _HEAVY_FIRST if n in names]
    return heavy + [n for n in names if n not in _HEAVY_FIRST]


def _check_one(spark, duck, name, plan_cache=None):
    df = QUERIES[name](spark, SF_DIR)
    if plan_cache is not None:
        # initial plan string, captured before execution finalizes AQE —
        # shared with tests/test_plan_quality.py's all_plans fixture so
        # the suite builds each face's side effects once, not twice
        plan_cache[(name, SF_DIR)] = (
            df._jdf.queryExecution().executedPlan().toString()
        )
    sdf = df.toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check, mirroring the driver
        return
    odf = duck.cursor().sql(ORACLES[name]).df()
    sc, oc = canon(sdf), canon(odf)
    assert list(sc.columns) == list(oc.columns), (
        f"{name}: columns {list(sc.columns)} != {list(oc.columns)}"
    )
    assert len(sc) == len(oc), f"{name}: {len(sc)} rows != {len(oc)}"
    assert sc.equals(oc), f"{name}: values differ from oracle"


# The registry is ~200 queries; serial replica time became the test
# suite's wall-clock ceiling. Spark schedules concurrent actions from
# threads onto the same local[32] executor pool, so an 8-wide fan-out
# keeps the machine busy without changing a single comparison. Set
# BDI_ORACLE_SERIAL=1 to fall back to one-query-at-a-time (granular
# timing / debugging).
def test_query_matches_oracle_all(spark, duck, face_plan_cache):
    from concurrent.futures import ThreadPoolExecutor

    names = _lpt_order(sorted(QUERIES))
    if os.environ.get("BDI_ORACLE_SERIAL"):
        failures = []
        for n in names:
            try:
                _check_one(spark, duck, n, face_plan_cache)
            except AssertionError as e:
                failures.append(str(e))
        assert not failures, "\n".join(failures)
        return
    def run(n):
        try:
            _check_one(spark, duck, n, face_plan_cache)
            return None
        except Exception as e:  # noqa: BLE001 — collected and re-raised
            return f"{n}: {e}"
    with ThreadPoolExecutor(
        max_workers=int(os.environ.get("BDI_ORACLE_POOL", "12"))
    ) as ex:
        failures = [r for r in ex.map(run, names) if r is not None]
    assert not failures, "\n".join(failures)


def test_ensure_gates_single_build_under_concurrency(spark):
    """Four threads racing an _ensure gate must produce ONE build (the
    8-wide oracle replica's shape): _ENSURE_LOCK serializes the
    train-once gates, every caller gets the same loaded model, and a
    later call never rewrites the sidecar."""
    import shutil
    import threading

    import __spark_entry__ as e

    path = e._clf_model_path(SF_DIR, "quality")
    shutil.rmtree(path, ignore_errors=True)
    results, errors = [], []

    def go():
        try:
            results.append(e._ensure_quality_clf(spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001 — surfaced below
            errors.append(ex)

    threads = [threading.Thread(target=go) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(results) == 4
    assert all(r == results[0] for r in results)
    marker = os.path.join(path, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    e._ensure_quality_clf(spark, SF_DIR)
    assert os.path.getmtime(marker) == mtime  # no rebuild
