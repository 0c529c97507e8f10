"""Market-basket analysis: frequent itemset mining (pair order) and
association rules with support / confidence / lift — the classic OLAP
affinity workload (Agrawal & Srikant, VLDB'94 apriori family).

The reference has no co-occurrence mining; engine-claimed extension in
the same family as the bigram/graph token statistics (operators/graph.py,
operators/text.py), built Spark-first:

- :func:`basket_items` — distinct (basket, item) pairs: one projection +
  dropDuplicates (map-side combinable).
- :func:`frequent_pairs` — the apriori pregate then a SELF-JOIN on the
  basket key restricted to frequent items with ``item_a < item_b``.
  The pregate is the scale lever: per-basket join fan-out is
  ``C(frequent items in basket, 2)``, and every 1-support item is
  eliminated BEFORE the join (downward-closure: a pair can only be
  frequent if both items are). Skewed mega-baskets are the residual
  risk — cap items per basket upstream if a basket can hold thousands.
- :func:`association_rules` — both directions of every frequent pair
  with ``confidence = supp(a,b)/supp(antecedent)`` and ``lift =
  confidence / (supp(consequent)/n_baskets)``. Pure integer-ratio
  arithmetic (rounded at 6 decimals), bit-identical cross-engine.

All shuffles are keyed aggregations or the basket-key equi-join; output
is itemset-vocabulary-sized, never row-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Distinct (basket, item) membership pairs."""
    return (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .where(F.col("basket").isNotNull() & F.col("item").isNotNull())
        .dropDuplicates(["basket", "item"])
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Item pairs co-occurring in at least ``min_support`` baskets.

    Returns ``(item_a, item_b, pair_support)`` with ``item_a < item_b``
    (string order). Both items individually pass the support bar first
    (apriori downward closure), so the self-join runs on the pruned
    membership table.
    """
    if min_support < 1:
        raise ValueError("frequent_pairs: min_support must be >= 1")
    items = basket_items(df, basket_col, item_col)
    support = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("item_support")
    )
    frequent = support.where(F.col("item_support") >= min_support)
    pruned = items.join(
        F.broadcast(frequent.select("item")), "item"
    ).select("basket", "item")
    a = pruned.select("basket", F.col("item").alias("item_a"))
    b = pruned.select("basket", F.col("item").alias("item_b"))
    pairs = a.join(b, "basket").where(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_support"))
        .where(F.col("pair_support") >= min_support)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Association rules from frequent pairs: one row per direction
    ``antecedent -> consequent`` with ``pair_support``, ``confidence``,
    and ``lift`` (>1 = positive affinity), filtered at
    ``min_confidence``. Ratios of exact bigint counts rounded to 6
    decimals — deterministic cross-engine.
    """
    items = basket_items(df, basket_col, item_col)
    n_baskets = items.agg(
        F.countDistinct("basket").cast("bigint").alias("n_baskets")
    )
    support = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("item_support")
    )
    pairs = frequent_pairs(df, basket_col, item_col, min_support=min_support)
    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_support",
        )
    )
    enriched = (
        both.join(
            F.broadcast(
                support.select(
                    F.col("item").alias("antecedent"),
                    F.col("item_support").alias("__sa"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                support.select(
                    F.col("item").alias("consequent"),
                    F.col("item_support").alias("__sc"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    conf = F.col("pair_support").cast("double") / F.col("__sa")
    lift = conf / (F.col("__sc").cast("double") / F.col("n_baskets"))
    return (
        enriched.where(F.round(conf, 6) >= F.lit(float(min_confidence)))
        .select(
            "antecedent",
            "consequent",
            "pair_support",
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )
