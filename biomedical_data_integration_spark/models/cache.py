"""Embedding memoization keyed by content fingerprint.

The reference caches column embeddings on disk keyed by a SHA-256 over the
column names and every row (``bdikit/utils.py:8-18``, files under
``~/.cache/bdikit/embeddings``, ``bdikit/download.py:7-20``). The engine's
equivalent is a parquet cache keyed by a *distributed* fingerprint:

- the reference hashes rows in table order — order-dependent and
  single-process. Spark has no stable row order, so the fingerprint is an
  order-insensitive aggregate (xor of per-row 64-bit hashes + row count +
  schema), which identifies the same logical table under any partitioning;
- cache hits skip the whole embedding job (the point of memoization: the
  embedder is the expensive model-inference step at scale).
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CACHE_DIR = os.path.expanduser(
    "~/.cache/biomedical_data_integration_spark/embeddings"
)


def table_fingerprint(df: DataFrame, columns: Optional[List[str]] = None) -> str:
    """Order-insensitive content fingerprint of (selected columns of) a table.

    xor-aggregate of per-row ``xxhash64`` + row count, combined with the
    schema (names + types) via md5 on the driver. One narrow aggregation
    job — no sort, no collect of data.
    """
    import hashlib

    cols = columns or df.columns
    proj = df.select(*cols)
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    agg = proj.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(row_hash), F.lit(0)).alias("x"),
    ).first()
    schema_part = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in proj.schema.fields)
    return hashlib.sha256(
        f"{schema_part}|{agg['n']}|{agg['x']}".encode()
    ).hexdigest()


class EmbeddingCache:
    """Parquet-backed memoization of ``ColumnEmbedder.column_embeddings``.

    ``get_or_compute`` returns the cached (column_name, embedding) table if
    the input fingerprint was seen before, else runs the embedder and
    persists the result. Cache entries are plain parquet directories named
    by fingerprint — inspectable, shareable, storable on any Hadoop FS.
    """

    def __init__(self, base_dir: str = DEFAULT_CACHE_DIR, embedder_key: str = "default"):
        self.base_dir = base_dir
        self.embedder_key = embedder_key

    def _path(self, fingerprint: str) -> str:
        return os.path.join(self.base_dir, self.embedder_key, fingerprint)

    def get_or_compute(
        self,
        df: DataFrame,
        embedder,
        columns: Optional[List[str]] = None,
    ) -> DataFrame:
        spark = df.sparkSession
        fp = table_fingerprint(df, columns)
        path = self._path(fp)
        marker = os.path.join(path, "_SUCCESS")
        if os.path.exists(marker):
            return spark.read.parquet(path)
        result = embedder.column_embeddings(df, columns)
        result.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
