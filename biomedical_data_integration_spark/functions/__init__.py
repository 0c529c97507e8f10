"""Scalar/array expression builders shared across operators.

Everything in this package returns ``pyspark.sql.Column`` expressions made
of built-in functions — the engine's rule is that per-row compute stays in
the JVM (whole-stage codegen) unless semantics force a pandas UDF.
"""

from biomedical_data_integration_spark.functions.strings import (
    char_ngrams,
    clean_string,
    indel_ratio,
    levenshtein_ratio,
    normalize_value,
    word_ngrams,
)
from biomedical_data_integration_spark.functions.hashing import (
    hex_nibble,
    md5_bigint,
    md5_hex,
    minhash_key,
)
from biomedical_data_integration_spark.functions.vectors import (
    cosine,
    dot,
    l2_normalize,
    norm,
)

__all__ = [
    "char_ngrams",
    "clean_string",
    "cosine",
    "dot",
    "hex_nibble",
    "indel_ratio",
    "l2_normalize",
    "levenshtein_ratio",
    "md5_bigint",
    "md5_hex",
    "minhash_key",
    "norm",
    "normalize_value",
    "word_ngrams",
]
