"""Engine-wide defaults.

Mirrors the reference's global configuration (``bdikit/config.py:7-17``):
the 0.3 value-match similarity threshold, the default matcher method names,
and top-k defaults (``bdikit/api.py:103``, ``api.py:226``,
``schema_matching/one2one/twophase.py:13``).

The reference's default schema matcher is ``coma`` (a Java subprocess,
``valentine.py:38-44``) which is not portable; here ``coma`` is an alias for
the engine-native deterministic composite matcher (see
``operators/schema_matching.py``).
"""

# Minimum similarity for a value match to be kept (bdikit/config.py:8).
DEFAULT_VALUE_MATCHING_THRESHOLD: float = 0.3

# Default matcher method names (bdikit/config.py:9-10).
DEFAULT_VALUE_MATCHING_METHOD: str = "tfidf"
DEFAULT_SCHEMA_MATCHING_METHOD: str = "coma"

# Top-k defaults (bdikit/api.py:103, api.py:226).
DEFAULT_SCHEMA_TOP_K: int = 10
DEFAULT_VALUE_TOP_K: int = 5

# Candidate-pruning width used by two_phase / max_val_sim
# (twophase.py:13, maxvalsim.py:14).
DEFAULT_PRUNE_TOP_K: int = 20

# Number of decimal places similarity scores are rounded to. Keeping scores
# rounded makes results reproducible across partitionings and lets the
# DuckDB oracle hash-match float outputs.
SIMILARITY_SCALE: int = 6
