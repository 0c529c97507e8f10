"""Record linkage: matching semantics, blocking, the pair-product
gate, and self-linkage recovery on perturbed copies."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.linkage import link_records


def _people(spark):
    left = spark.createDataFrame(
        [
            (1, "john smith", "ny"),
            (2, "jane doe", "ca"),
            (3, "completely unrelated", "tx"),
        ],
        "lid bigint, name string, state string",
    )
    right = spark.createDataFrame(
        [
            (10, "Jon Smith", "ny"),
            (11, "Jane  Doe!", "ca"),
            (12, "Bob Roe", "ny"),
        ],
        "rid bigint, full_name string, st string",
    )
    return left, right


def test_link_records_top1_with_threshold(spark):
    left, right = _people(spark)
    got = {
        r["lid"]: (r["rid"], r["score"])
        for r in link_records(
            left, right, [("name", "full_name", 1.0)],
            "lid", "rid", threshold=0.7,
        ).collect()
    }
    assert got[1][0] == 10 and got[2][0] == 11
    assert got[2][1] == 1.0          # clean_string strips the '!' and case
    assert 3 not in got              # below threshold: no forced match


def test_link_records_blocking_restricts_candidates(spark):
    left, right = _people(spark)
    # blocking on state: jane(ca) can only see rid 11; john(ny) sees 10, 12
    out = link_records(
        left, right, [("name", "full_name", 1.0)],
        "lid", "rid", threshold=0.0, top_k=10,
        block_on=("state", "st"),
    )
    cands = {(r["lid"], r["rid"]) for r in out.collect()}
    assert (2, 11) in cands and (2, 10) not in cands
    assert {(1, 10), (1, 12)} <= cands
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_link_records_weighted_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "ann", "12 main st")], "lid bigint, n string, a string"
    )
    right = spark.createDataFrame(
        [(7, "ann", "99 other rd"), (8, "anx", "12 main st")],
        "rid bigint, n string, a string",
    )
    # address dominates: 8 must win despite the worse name
    got = link_records(
        left, right, [("n", "n", 1.0), ("a", "a", 5.0)],
        "lid", "rid", threshold=0.0,
    ).collect()
    assert got[0]["rid"] == 8


def test_link_records_refuses_unblocked_blowup(spark):
    big = spark.range(3000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="EXACT_PAIR_LIMIT"):
        link_records(big, big, [("v", "v", 1.0)], "k", "k")


def test_link_records_recovers_perturbed_self_matches(spark):
    rows = [(i, f"supplier number {i} incorporated") for i in range(40)]
    right = spark.createDataFrame(rows, "rid bigint, name string")
    dirty = right.select(
        F.col("rid").alias("lid"),
        F.upper(F.regexp_replace("name", "incorporated", "inc")).alias(
            "name"
        ),
    )
    got = {
        r["lid"]: r["rid"]
        for r in link_records(
            dirty, right, [("name", "name", 1.0)], "lid", "rid",
            threshold=0.6,
        ).collect()
    }
    correct = sum(1 for lid, rid in got.items() if lid == rid)
    assert correct >= 38  # near-perfect self-recovery


def test_link_records_validates_args(spark):
    left, right = _people(spark)
    with pytest.raises(ValueError, match="keys"):
        link_records(left, right, [], "lid", "rid")
    with pytest.raises(ValueError, match="top_k"):
        link_records(left, right, [("name", "full_name", 1.0)],
                     "lid", "rid", top_k=0)
