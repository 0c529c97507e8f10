"""Physical-plan introspection: the dev-facing face of the plan-quality
gate (tests/test_plan_quality.py) — summarize what a DataFrame's executed
plan will actually do so scale regressions are visible before a job runs
at 100 TB.

The numbers come from ``df._jdf.queryExecution().executedPlan()``. Before
the query has actually run, AQE reports its INITIAL adaptive plan (the
``== Initial Plan ==`` section that appears after execution is excluded
either way), so pre-execution counts are upper bounds that runtime
re-optimization can improve — e.g. a sort-merge join AQE later converts
to broadcast still counts as a shuffle here. Call after an action for
the realized plan; for CI budgets the pre-execution upper bound is the
conservative (safe) side.
"""

from __future__ import annotations

import re
from typing import Dict

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> Dict[str, object]:
    """Summarize the executed physical plan of ``df``.

    Returns a dict with:

    - ``n_scans`` — file/relation scans (each is a full pass over a source)
    - ``n_exchanges`` — shuffle exchanges (the dominant cluster cost)
    - ``n_broadcasts`` — broadcast exchanges (small-side joins, cheap)
    - ``n_sorts`` — global or per-partition sort operators
    - ``n_wscg_spans`` — whole-stage-codegen spans (bigger spans = more of
      the plan runs as generated JVM code)
    - ``python_exec`` — True if any Arrow/pandas Python operator appears
      (the slow path; expected only where an operator declares it)
    - ``cartesian`` — True if a CartesianProduct / BroadcastNestedLoop
      join appears (all-pairs joins; red flag unless one side is tiny)
    - ``pushed_filters`` — True if at least one non-empty parquet
      ``PushedFilters`` list survives to the scan
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    wscg = len(set(re.findall(r"\*\((\d+)\)", final)))
    return {
        "n_scans": len(re.findall(r"Scan (?:parquet|csv|json|ExistingRDD)", final)),
        "n_exchanges": final.count("Exchange hashpartitioning")
        + final.count("Exchange rangepartitioning")
        + final.count("Exchange SinglePartition"),
        "n_broadcasts": final.count("BroadcastExchange"),
        "n_sorts": final.count("Sort ["),
        "n_wscg_spans": wscg,
        "python_exec": ("ArrowEvalPython" in final)
        or ("MapInPandas" in final)
        or ("FlatMapGroupsInPandas" in final),
        "cartesian": ("CartesianProduct" in final)
        or ("BroadcastNestedLoopJoin" in final),
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", final)
        ),
    }


def assert_scalable(
    df: DataFrame,
    max_exchanges: int = None,
    allow_python: bool = False,
    allow_cartesian: bool = False,
) -> Dict[str, object]:
    """Raise ``AssertionError`` if the plan violates the given scale
    budget; returns the summary on success. Meant for pipeline CI: wrap
    the queries you ship and fail the build when a change introduces an
    extra shuffle, a Python operator, or an all-pairs join."""
    s = plan_summary(df)
    if max_exchanges is not None and s["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {s['n_exchanges']} shuffles (budget {max_exchanges})"
        )
    if not allow_python and s["python_exec"]:
        raise AssertionError("plan contains Arrow/pandas Python execution")
    if not allow_cartesian and s["cartesian"]:
        raise AssertionError("plan contains an all-pairs (cartesian) join")
    return s
