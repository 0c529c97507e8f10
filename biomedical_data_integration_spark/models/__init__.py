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

    #: fan-out of the two-level min-k aggregation: partial top-k per
    #: (column, bucket), then merge k·BUCKETS candidates per column. Bounds
    #: the final per-column merge at k·64 values regardless of cardinality.
    _MINK_BUCKETS = 64

    def _long_form(self, df: DataFrame, cols: List[str]) -> DataFrame:
        """One scan: unpivot all requested columns to (column_name, value)."""
        return (
            df.select([F.col(c).cast("string").alias(c) for c in cols])
            .unpivot([], cols, "column_name", "value")
            .where(F.col("value").isNotNull())
        )

    def _sampled_values(self, df: DataFrame, cols: List[str]) -> DataFrame:
        """(column_name, vals: array<string>) — ≤``sample_values`` distinct
        values per column in the strategy's order.

        head/random/frequent avoid any per-column global sort: a window
        ``row_number`` over ``partitionBy(column_name)`` would sort ALL
        distinct values of a column in ONE task (600k rows for a
        high-cardinality key locally; unbounded on a cluster). Instead we
        take min-k under an ordering key with a two-level bucketed
        aggregation: partial sorted-top-k per (column, hash-bucket) — map
        side combinable, ~BUCKETS tasks per column — then merge k·BUCKETS
        candidates per column. Only 'constant' (every-nth over the full
        sorted domain) genuinely needs global ranks and keeps the window.
        """
        long_df = self._long_form(df, cols)
        k = self.sample_values

        if self.sample_strategy == "constant":
            # every nth distinct value (``cl_preprocessor.py:91-105``):
            # stride so the sample spans the whole sorted domain; needs a
            # global per-column rank, so this path keeps the window sort
            w = Window.partitionBy("column_name").orderBy(F.col("value"))
            sampled = long_df.distinct().withColumn(
                "__rk", F.row_number().over(w)
            )
            n_distinct = F.count("*").over(Window.partitionBy("column_name"))
            step = F.greatest(F.floor(n_distinct / k), F.lit(1))
            sampled = (
                sampled.withColumn("__pick", ((F.col("__rk") - 1) % step) == 0)
                .where(F.col("__pick"))
                .withColumn(
                    "__rk",
                    F.row_number().over(
                        Window.partitionBy("column_name").orderBy("__rk")
                    ),
                )
                .where(F.col("__rk") <= k)
            )
            return sampled.groupBy("column_name").agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__rk", "value"))),
                    lambda s: s["value"],
                ).alias("vals")
            )

        # ordering key: min-k under ascending struct sort ⇒ first field
        # encodes the strategy's priority, tie-broken by the value itself.
        # NOTE: the separate distinct (a codegen'd row-level hash agg)
        # deliberately precedes the collect_list — folding the dedup into
        # the collector as collect_set is 2.4x SLOWER (ObjectHashAggregate
        # buffers per-group sets, no whole-stage codegen; measured at sf0.1)
        if self.sample_strategy == "frequent":
            # most frequent first (``cl_preprocessor.py:108-127``); count
            # per (column, value) is one map-side-combinable aggregation
            distinct_vals = long_df.groupBy("column_name", "value").agg(
                F.count("*").alias("__f")
            )
            ord_key = (-F.col("__f")).cast("long")
        elif self.sample_strategy == "random":
            # seedless determinism: order by a value-derived hash, so the
            # "random" sample is partition- and run-stable (Spark
            # rand(seed) is partition-dependent, SURVEY §7.3)
            distinct_vals = long_df.distinct()
            ord_key = F.md5(F.concat(F.lit("hcs|"), F.col("value")))
        else:  # head: lexicographic order
            distinct_vals = long_df.distinct()
            ord_key = F.lit(0)

        topk = lambda arr: F.slice(F.sort_array(arr), 1, k)  # noqa: E731
        merged = (
            distinct_vals.withColumn(
                "__b", F.pmod(F.xxhash64("value"), F.lit(self._MINK_BUCKETS))
            )
            .groupBy("column_name", "__b")
            .agg(topk(F.collect_list(F.struct(ord_key.alias("__o"), "value"))).alias("part"))
            .groupBy("column_name")
            .agg(topk(F.flatten(F.collect_list("part"))).alias("vs"))
        )
        return merged.select(
            "column_name",
            F.transform("vs", lambda s: s["value"]).alias("vals"),
        )

    def serialized_columns(
        self, df: DataFrame, columns: Optional[List[str]] = None
    ) -> DataFrame:
        cols = columns or df.columns
        serialized = self._sampled_values(df, cols).select(
            "column_name",
            F.concat(
                F.col("column_name"),
                F.lit(" "),
                F.array_join("vals", " "),
            ).alias("serialized"),
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
