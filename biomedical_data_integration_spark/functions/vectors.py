"""Vector math over ``array<float|double>`` columns, JVM-side.

Embedding columns are plain Spark arrays (no pyspark.ml Vector UDT), so
dot products and norms compile to ``aggregate``/``zip_with`` higher-order
functions inside codegen — no Python, no Arrow transfer. These are the
kernels under similarity search (`operators/similarity.py`) and the
embedding schema matchers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm of a numeric array (double)."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """Array rescaled to unit L2 norm (zero vectors pass through)."""
    n = norm(a)
    return F.when(n == 0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda v: v.cast("double") / n)
    )
