"""Table sources.

The reference reads CSV with pandas in its examples and a JSON vocabulary
resource (SURVEY §2.7). The engine exposes the standard Spark readers with
harmonization-friendly defaults and a helper for the test-harness parquet
layout (one file per table under an sf directory).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV with header+inferSchema, mirroring the reference's dynamic
    pandas typing (SURVEY §1.2)."""
    opts = {"header": "true", "inferSchema": "true"}
    opts.update({k: str(v) for k, v in options.items()})
    return spark.read.options(**opts).csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).json(path)


#: below this input size the extra shuffle stage costs more than the
#: parallelism buys — single-core map work over a few hundred KB is
#: sub-second, while every added exchange is a scheduled stage on the
#: query's critical path
_SPREAD_MIN_BYTES = 512 * 1024


def _spread_single_split(df: DataFrame, path: str) -> DataFrame:
    """Spread a table that arrived as fewer splits than cores.

    Parquet splits at row-group granularity, so a small file is ONE
    partition and every map-side operator over it runs on one core — a
    local-test artifact that misrepresents the operators (cluster inputs
    are thousands of splits). One cheap round-robin shuffle restores the
    parallelism the same plan would have on real input. Only fires for
    genuinely under-split frames that are big enough to matter.
    """
    try:
        size = (
            os.path.getsize(path)
            if os.path.isfile(path)
            else sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
            )
        )
    except OSError:
        size = 0
    if size < _SPREAD_MIN_BYTES:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(par, 8):
        return df.repartition(par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One harness table: ``{sf_dir}/{name}.parquet``.

    The events table carries parquet TIMESTAMP(NANOS), which Spark rejects
    by default — read it as long nanos (legacy conf) and convert to a
    proper timestamp at microsecond precision.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
        if ts_type.get("ts") == "bigint":
            # integer division: double math would lose precision on
            # nanosecond epochs (~1.7e18 > 2^53)
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return _spread_single_split(df, path)
    return _spread_single_split(spark.read.parquet(path), path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TPCH_TABLES
) -> Dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TPCH_TABLES
) -> None:
    """Register the harness tables as temp views for spark.sql access."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    format: str = "jsonl",
    text_field: str = "text",
    id_field: str = None,
    source: str = None,
) -> DataFrame:
    """Ingest a raw text corpus into the engine's canonical document
    shape ``(doc_id, text, source)`` — the entry point in front of the
    text-pipeline operators (dedup, quality, chunking, packing).

    - ``format="jsonl"``: newline-delimited JSON (``spark.read.json``
      handles the line framing natively); ``text_field`` selects the
      document text and ``id_field`` the stable id. Without ``id_field``
      the id is the md5-bigint of the text — content-addressed, stable
      across re-ingests, and exact duplicates collide on purpose (they
      are duplicates; run drop_exact_duplicates next).
    - ``format="text"``: one document per FILE (``wholetext``), id =
      md5-bigint of the file path. Use for directory-of-.txt corpora.

    ``source`` tags every row (defaults to the input path) so the mixing
    operators (`mix_corpus_by_tokens`, `temperature_mix`) can key on it.
    """
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.functions.hashing import md5_bigint

    src = source if source is not None else path
    if format == "jsonl":
        raw = spark.read.json(path)
        if text_field not in raw.columns:
            raise ValueError(
                f"read_text_corpus: field {text_field!r} not in "
                f"{sorted(raw.columns)}"
            )
        if id_field is not None:
            if id_field not in raw.columns:
                raise ValueError(
                    f"read_text_corpus: field {id_field!r} not in "
                    f"{sorted(raw.columns)}"
                )
            from pyspark.sql.types import NumericType

            # a numeric-typed id casts losslessly; a STRING id field (JSON
            # inference means at least one value is non-numeric) must be
            # hashed — casting would turn non-numeric ids into NULLs that
            # all collide, corrupting downstream dedup/sampling on doc_id
            if isinstance(raw.schema[id_field].dataType, NumericType):
                doc_id = F.col(id_field).cast("bigint")
            else:
                doc_id = md5_bigint(F.col(id_field).cast("string"))
        else:
            doc_id = md5_bigint(F.col(text_field))
        return raw.select(
            doc_id.alias("doc_id"),
            F.col(text_field).cast("string").alias("text"),
            F.lit(src).alias("source"),
        )
    if format == "text":
        raw = spark.read.format("text").option("wholetext", "true").load(path)
        raw = raw.select(
            F.col("value").alias("text"),
            F.input_file_name().alias("__file"),
        )
        return raw.select(
            md5_bigint(F.col("__file")).alias("doc_id"),
            F.col("text").cast("string").alias("text"),
            F.lit(src).alias("source"),
        )
    raise ValueError(f"read_text_corpus: unknown format {format!r}")


def read_media_binaries(
    spark: SparkSession,
    path: str,
    media_type: str = None,
    pattern: str = None,
) -> DataFrame:
    """Ingest a directory of media files into the engine's canonical
    media shape (media_id, content, media_type, meta) — the object-storage
    front end of the multimodal operators (decode_image_features,
    extract_audio_features, sample_video_frames, resize_images).

    Uses Spark's built-in ``binaryFile`` source: the scan is distributed
    (one task per file split assignment), the content column is the raw
    bytes, and ``pathGlobFilter`` pushes the filename pattern into the
    listing so non-matching files are never opened. ``media_id`` is the
    md5-bigint of the file path (stable across re-ingests);
    ``media_type`` defaults to the extension-derived kind
    (ppm/pgm/bmp -> image, wav -> audio, y4m -> video).
    """
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.functions.hashing import md5_bigint

    reader = spark.read.format("binaryFile")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    kind = (
        F.lit(media_type)
        if media_type is not None
        else F.when(ext.isin("ppm", "pgm", "bmp", "png", "jpg", "jpeg"), "image")
        .when(ext.isin("wav", "mp3", "flac"), "audio")
        .when(ext.isin("y4m", "mp4", "mkv", "webm"), "video")
        .otherwise("unknown")
    )
    return raw.select(
        md5_bigint(F.col("path")).alias("media_id"),
        F.col("content"),
        kind.alias("media_type"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("n_bytes"), F.col("length").cast("string"),
        ).alias("meta"),
    )
