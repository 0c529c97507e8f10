"""Deterministic, oracle-portable hashing primitives.

Everything here is built on ``md5`` of strings because md5 is available
and bit-identical in Spark, DuckDB, and every other SQL engine — unlike
``hash()`` (murmur3 in Spark, xxhash in DuckDB). Hex nibbles are decoded
with ``instr('0123456789abcdef', c) - 1`` so no engine-specific
hex-to-int cast is needed.

These primitives power MinHash signatures, SimHash fingerprints, and
LSH hyperplanes (see ``operators/dedup.py`` / ``operators/similarity.py``).
The reference's only hashing is a SHA-256 table fingerprint for its
embedding cache (``bdikit/utils.py:8-18``); the sketch family here is the
100 TB-scale extension of that idea.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def md5_hex(col: Column, salt: str | None = None) -> Column:
    """md5 hex digest of a (salted) string column."""
    base = col.cast("string")
    if salt is not None:
        base = F.concat(F.lit(salt + "|"), base)
    return F.md5(base)


def hex_nibble(hexcol: Column, pos: int) -> Column:
    """Value 0..15 of the 1-indexed hex digit at ``pos`` — portable SQL:
    ``instr('0123456789abcdef', substr(h, pos, 1)) - 1``."""
    return (
        F.call_function("instr", F.lit(_HEX), F.substring(hexcol, pos, 1)) - 1
    ).cast("int")


def minhash_key(col: Column, seed: int) -> Column:
    """Lexicographic-min-able hash key for MinHash permutation ``seed``.

    A uniformly distributed injective-enough key: the md5 hex digest of the
    salted value. ``min()`` over these per document = classic MinHash with
    the permutation indexed by ``seed``.
    """
    return md5_hex(col, salt=f"mh{seed}")


def md5_bigint(col: Column, salt: str | None = None) -> Column:
    """First 60 bits of the salted md5, as a non-negative bigint.

    Portable: ``conv(substring(md5(x), 1, 15), 16, 10)`` in Spark;
    the oracle uses the same 15 hex chars so values agree exactly.
    """
    return F.conv(F.substring(md5_hex(col, salt), 1, 15), 16, 10).cast("bigint")
