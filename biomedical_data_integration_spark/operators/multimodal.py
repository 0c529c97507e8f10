"""Multimodal column plumbing (images/audio/video as opaque binary).

Training-data pipelines carry media as ``binary`` content columns plus a
typed metadata struct; the heavy decode/feature steps run as Arrow-batched
pandas functions over ``mapInPandas`` so each Python worker touches one
batch at a time (bounded memory at any scale — never collect, never
per-row UDF).

The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in this
environment, so the decode kernels are STUBS behind
``decoder="deterministic_fake"`` (md5-derived pseudo-metadata, fully
testable plumbing) or ``decoder="real"`` -> ``NotImplementedError`` with
the integration point documented. The Spark-side contract — schemas,
batch iteration, partition behavior — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_content(
    df: DataFrame, id_col: str, payload_col: str, media_type: str
) -> DataFrame:
    """Build a media table from any table: content = binary of the payload
    column (for tests: deterministic synthetic bytes), meta = size map.
    This is the ingest adapter; in production content comes off object
    storage via spark.read.format('binaryFile')."""
    content = F.to_binary(F.md5(F.col(payload_col).cast("string")), F.lit("hex"))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit(media_type).alias("media_type"),
        F.create_map(
            F.lit("n_bytes"), F.length(content).cast("string")
        ).alias("meta"),
    )


def _fake_image_decode(batch_iter: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Deterministic fake decoder: derives pseudo width/height/channels and
    an 8-d feature vector from the content bytes. Replace the body with a
    real PIL/torchvision decode when the libs exist on executors."""
    import hashlib

    import numpy as np
    import pandas as pd

    for pdf in batch_iter:
        out = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            # hash the HEX of the payload (not raw bytes): SQL engines can
            # md5 strings but not blobs, which keeps this fake codec
            # oracle-reproducible end to end
            h = hashlib.md5(bytes(content).hex().encode()).digest()
            width = 64 + h[0] % 192
            height = 64 + h[1] % 192
            feats = np.frombuffer(h[:8], dtype=np.uint8).astype("float32") / 255.0
            out.append((int(mid), int(width), int(height), 3, feats.tolist()))
        yield pd.DataFrame(
            out, columns=["media_id", "width", "height", "n_channels", "features"]
        )


def decode_image_features(
    media: DataFrame, decoder: str = "deterministic_fake"
) -> DataFrame:
    """Decode images and extract features, batched via mapInPandas.

    ``decoder='deterministic_fake'`` exercises the full distributed
    plumbing (schema, Arrow batches, partition-parallel decode) without
    codec libraries; ``decoder='real'`` is the marked integration point.
    """
    if decoder == "real":
        raise NotImplementedError(
            "Real image decode needs PIL/torchvision on the executors; "
            "swap _fake_image_decode's body for the real codec. The Spark "
            "plumbing (mapInPandas over binary content) is identical."
        )
    if decoder != "deterministic_fake":
        raise ValueError(f"Unknown decoder: {decoder!r}")
    return media.select("media_id", "content").mapInPandas(
        _fake_image_decode, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, decoder: str = "deterministic_fake"
) -> DataFrame:
    """Frame sampling contract: one output row per sampled frame
    (media_id, frame_idx, ts_seconds, frame binary). The fake decoder
    emits 3 pseudo-frames per video; the real one is the marked stub."""
    if decoder == "real":
        raise NotImplementedError(
            "Real frame sampling needs ffmpeg/av on the executors."
        )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_seconds", T.DoubleType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fake_frames(batch_iter):
        import hashlib

        import pandas as pd

        for pdf in batch_iter:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i in range(3):
                    fh = hashlib.md5(bytes(content) + bytes([i])).digest()
                    rows.append((int(mid), i, i * every_n_seconds, fh))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_seconds", "frame"]
            )

    return media.select("media_id", "content").mapInPandas(fake_frames, schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_audio_decode(batch_iter: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Deterministic fake audio decoder: pseudo sample-rate/duration and an
    8-band "spectral" vector from the content bytes (same md5-of-hex trick
    as the image codec, so SQL oracles can replay it). Replace the body
    with torchaudio/librosa when the libs exist on executors."""
    import hashlib

    import numpy as np
    import pandas as pd

    for pdf in batch_iter:
        out = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            h = hashlib.md5(bytes(content).hex().encode()).digest()
            sample_rate = 8000 * (1 + h[0] % 5)
            duration_ms = 500 + (h[1] * 256 + h[2]) % 60000
            n_samples = sample_rate * duration_ms // 1000
            feats = (
                np.frombuffer(h[4:12], dtype=np.uint8).astype("float32") / 255.0
            )
            out.append(
                (int(mid), int(sample_rate), int(duration_ms), int(n_samples),
                 feats.tolist())
            )
        yield pd.DataFrame(
            out,
            columns=["media_id", "sample_rate", "duration_ms", "n_samples",
                     "features"],
        )


def extract_audio_features(
    media: DataFrame, decoder: str = "deterministic_fake"
) -> DataFrame:
    """Audio decode + feature extraction, batched via mapInPandas — the
    audio leg of the image/audio/video triad. Same contract as
    :func:`decode_image_features`: the fake decoder proves the whole
    binary -> Arrow -> typed-features pipeline; ``decoder='real'`` is the
    marked torchaudio/librosa integration point.
    """
    if decoder == "real":
        raise NotImplementedError(
            "Real audio decode needs torchaudio/librosa on the executors; "
            "swap _fake_audio_decode's body for the real codec. The Spark "
            "plumbing (mapInPandas over binary content) is identical."
        )
    if decoder != "deterministic_fake":
        raise ValueError(f"Unknown decoder: {decoder!r}")
    return media.select("media_id", "content").mapInPandas(
        _fake_audio_decode, AUDIO_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    decoder: str = "deterministic_fake",
) -> DataFrame:
    """Resize images to a fixed target — the preprocessing step in front
    of any vision encoder. Same contract as the other codecs: the fake
    path derives the resized payload deterministically (md5 of the source
    hex + target dims) so the plumbing is testable and oracle-replayable;
    ``decoder='real'`` marks the PIL/torchvision integration point.

    One mapInPandas pass; output rows carry the (claimed) target dims and
    the new binary payload.
    """
    if decoder == "real":
        raise NotImplementedError(
            "Real image resize needs PIL/torchvision on the executors; "
            "swap the fake body for Image.open(...).resize(...)."
        )
    if decoder != "deterministic_fake":
        raise ValueError(f"Unknown decoder: {decoder!r}")
    tw, th = int(target_width), int(target_height)

    def _fake_resize(batch_iter):
        import hashlib

        import pandas as pd

        for pdf in batch_iter:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                seed = f"{bytes(content).hex()}|{tw}x{th}".encode()
                out.append((int(mid), tw, th, hashlib.md5(seed).digest()))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "content"]
            )

    return media.select("media_id", "content").mapInPandas(
        _fake_resize, RESIZED_SCHEMA
    )
