"""Row-level record linkage (entity matching) between two tables.

The reference harmonizes SCHEMAS (column matching) and VALUE DOMAINS
(vocabulary matching); the third face of data integration is matching
the ROWS themselves — patient records against a registry, suppliers
against a master list. This module is that face, built from the same
oracle-portable kernels the value matchers use (``levenshtein`` is a
built-in in Spark and every SQL engine; cleaning is the shared
``clean_string``).

Scale shape: candidate generation is the whole game. With ``block_on``
the candidate set is a plain equi-join on the blocking key (shuffle on
the key, skew = ordinary join skew). Without blocking the pair product
is gated through ``planning.pair_blocking_kernel``: small products run
as a broadcast nested-loop (fused-codegen scoring); past the limit the
operator REFUSES and tells the caller to block — silently running an
n x m cross product at corpus scale is exactly the trap an engine
should not fall into.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import planning
from ..functions.strings import clean_string, levenshtein_ratio

SCORE_SCALE = 6


def link_records(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[Tuple[str, str, float]],
    left_id: str,
    right_id: str,
    threshold: float = 0.7,
    block_on: Tuple[str, str] | None = None,
    top_k: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """Link rows of ``left`` to rows of ``right``.

    ``keys`` lists the attribute pairs to compare —
    ``(left_col, right_col, weight)`` — scored with normalized
    Levenshtein similarity (optionally ``clean_string``-normalized
    first) and combined as the weight-normalized average. Each left row
    keeps its ``top_k`` best right rows (score desc, right id asc —
    total order) at or above ``threshold``.

    ``block_on=(lcol, rcol)`` generates candidates by key equality
    (the standard blocking join). Without it the pair product must fit
    ``planning.EXACT_PAIR_LIMIT`` — the operator counts both sides and
    raises past the limit rather than silently planning a corpus-scale
    cross product.

    Blocking-key cardinality is the scale knob: per-block work is
    |block_l| x |block_r|, so a FIXED-cardinality key (country, nation)
    grows quadratically as both sides grow — measured in PERF_NOTES.
    At corpus scale block on keys whose cardinality tracks the data
    (name prefixes, phonetic codes, LSH bands), or compose several.

    Scores are floor-quantized to 6 decimals (integer levenshtein /
    integer lengths — identical doubles cross-engine; the quantization
    only guards the weighted average). Output: (left_id, right_id,
    score).
    """
    if not keys:
        raise ValueError("link_records: keys must be non-empty")
    if top_k < 1:
        raise ValueError("link_records: top_k must be >= 1")
    wsum = float(sum(w for _, _, w in keys))
    if wsum <= 0:
        raise ValueError("link_records: weights must sum > 0")

    # normalization is staged BEFORE candidate generation: applied inside
    # the score expression it would re-run the clean_string regexes once
    # per candidate PAIR (the interpreted-expression staging trap in
    # PERF_NOTES) — measured 10x slower on the blocked customer linkage
    def attr(col, name):
        c = F.col(col).cast("string")
        return (clean_string(c) if normalize else c).alias(name)

    l = left.select(
        F.col(left_id).alias("__lid"),
        *[attr(lc, f"__l_{i}") for i, (lc, _, _) in enumerate(keys)],
        *([F.col(block_on[0]).alias("__lblk")] if block_on else []),
    )
    r = right.select(
        F.col(right_id).alias("__rid"),
        *[attr(rc, f"__r_{i}") for i, (_, rc, _) in enumerate(keys)],
        *([F.col(block_on[1]).alias("__rblk")] if block_on else []),
    )
    if block_on:
        cand = l.join(r, F.col("__lblk").eqNullSafe(F.col("__rblk")))
    else:
        n_l, n_r = l.count(), r.count()
        if planning.pair_blocking_kernel(n_l, n_r) != "exact":
            raise ValueError(
                f"link_records: {n_l} x {n_r} pairs exceed "
                f"planning.EXACT_PAIR_LIMIT ({planning.EXACT_PAIR_LIMIT}); "
                "pass block_on=(left_col, right_col) to generate "
                "candidates with a blocking join"
            )
        cand = l.join(F.broadcast(r))

    total = F.lit(0.0)
    for i, (_, _, w) in enumerate(keys):
        a, b = F.col(f"__l_{i}"), F.col(f"__r_{i}")
        total = total + F.lit(float(w)) * levenshtein_ratio(a, b)
    score = F.floor(total / wsum * 10 ** SCORE_SCALE + F.lit(0.5)) / (
        10 ** SCORE_SCALE
    )
    scored = cand.select(
        "__lid", "__rid", score.alias("score")
    ).where(F.col("score") >= threshold)
    w_rank = Window.partitionBy("__lid").orderBy(
        F.col("score").desc(), F.col("__rid").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w_rank))
        .where(F.col("__rn") <= top_k)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "score",
        )
    )


def golden_record(
    df: DataFrame,
    cluster_col: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Survivorship: collapse each entity cluster (the output of
    :func:`link_records` + ``duplicate_clusters``, or any grouping) to
    ONE canonical row — per column, the modal non-null value with ties
    broken by the smallest value. The master-data "golden record" step
    that follows matching in an MDM pipeline.

    Returns one row per cluster: ``(cluster_col, <value_cols...>,
    n_members)``. Deterministic: (count DESC, value ASC) is a total
    order, so the survivor is a pure function of the cluster contents.

    Scale shape: per column, one map-side-combinable
    ``groupBy(cluster, value).count`` + one cluster-keyed argmax window
    — never a per-cluster collect. Columns process as independent jobs
    joined back on the cluster key (each join is cluster-count-sized).
    """
    from pyspark.sql import Window

    if value_cols is None:
        value_cols = [c for c in df.columns if c != cluster_col]
    if not value_cols:
        raise ValueError("golden_record: need at least one value column")
    out = df.groupBy(F.col(cluster_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    for c in value_cols:
        counts = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(cluster_col), F.col(c))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = Window.partitionBy(cluster_col).orderBy(
            F.desc("__n"), F.asc(c)
        )
        winner = (
            counts.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(F.col(cluster_col), F.col(c))
        )
        out = out.join(winner, cluster_col, "left")
    return out.select(cluster_col, *value_cols, "n_members")
