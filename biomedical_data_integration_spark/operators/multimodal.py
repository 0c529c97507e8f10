"""Multimodal column plumbing (images/audio/video as opaque binary).

Training-data pipelines carry media as ``binary`` content columns plus a
typed metadata struct; the heavy decode/feature steps run as Arrow-batched
pandas functions over ``mapInPandas`` so each Python worker touches one
batch at a time (bounded memory at any scale — never collect, never
per-row UDF).

Two decoder tiers, same Spark plumbing:

- ``decoder="real"`` — actual decode of the uncompressed interchange
  formats that parse with stdlib + numpy alone (PPM/PGM/BMP images,
  PCM WAV audio, YUV4MPEG2 video; see
  :mod:`biomedical_data_integration_spark.functions.media`). Compressed
  codecs (JPEG/MP3/H.264) raise ValueError from the codec layer until
  PIL/ffmpeg exist on the executors — the integration point is the
  per-payload decode function, not the Spark plumbing.
- ``decoder="deterministic_fake"`` — md5-derived pseudo-metadata used by
  the SQL-oracle queries (an oracle can replay md5-of-hex, not a codec).
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


def _real_image_decode(batch_iter: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Real decode for PPM/PGM/BMP payloads: true dims/channels and an
    8-d stat descriptor (channel means, gray std, 4-bin gray histogram).
    One Arrow batch at a time — bounded memory at any corpus size."""
    import pandas as pd

    from biomedical_data_integration_spark.functions.media import (
        decode_image,
        image_stat_features,
    )

    for pdf in batch_iter:
        out = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            img = decode_image(bytes(content))
            out.append(
                (int(mid), int(img.shape[1]), int(img.shape[0]),
                 int(img.shape[2]), image_stat_features(img))
            )
        yield pd.DataFrame(
            out, columns=["media_id", "width", "height", "n_channels", "features"]
        )


def decode_image_features(
    media: DataFrame, decoder: str = "deterministic_fake"
) -> DataFrame:
    """Decode images and extract features, batched via mapInPandas.

    ``decoder='real'`` decodes PPM/PGM/BMP with stdlib+numpy (true
    width/height/channels + stat features); ``decoder='deterministic_fake'``
    is the md5-derived path the SQL oracles replay.
    """
    if decoder == "real":
        kernel = _real_image_decode
    elif decoder == "deterministic_fake":
        kernel = _fake_image_decode
    else:
        raise ValueError(f"Unknown decoder: {decoder!r}")
    return media.select("media_id", "content").mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0, decoder: str = "deterministic_fake"
) -> DataFrame:
    """Frame sampling: one output row per sampled frame
    (media_id, frame_idx, ts_seconds, frame binary).

    ``decoder='real'`` parses YUV4MPEG2 payloads (the raw-frame format
    any ffmpeg pipeline emits) and keeps the first frame at-or-after each
    ``every_n_seconds`` boundary, re-encoding the luma plane as PGM —
    frame_idx/ts are the true stream positions. The fake decoder emits 3
    pseudo-frames per video for the oracle path."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_seconds", T.DoubleType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    if decoder == "real":
        step = float(every_n_seconds)

        def real_frames(batch_iter):
            import pandas as pd

            from biomedical_data_integration_spark.functions.media import (
                encode_netpbm,
                iter_y4m_frames,
            )

            for pdf in batch_iter:
                rows = []
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    next_ts = 0.0
                    for idx, ts, y in iter_y4m_frames(bytes(content)):
                        if ts + 1e-9 >= next_ts:
                            rows.append(
                                (int(mid), int(idx), float(ts),
                                 encode_netpbm(y[:, :, None]))
                            )
                            next_ts += step
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "frame_idx", "ts_seconds", "frame"],
                )

        return media.select("media_id", "content").mapInPandas(
            real_frames, schema
        )
    if decoder != "deterministic_fake":
        raise ValueError(f"Unknown decoder: {decoder!r}")

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


def _real_audio_decode(batch_iter: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Real decode for PCM WAV payloads (stdlib wave + numpy FFT)."""
    import pandas as pd

    from biomedical_data_integration_spark.functions.media import (
        audio_band_features,
        decode_wav,
    )

    for pdf in batch_iter:
        out = []
        for mid, content in zip(pdf["media_id"], pdf["content"]):
            sr, _nch, samples = decode_wav(bytes(content))
            n_frames = samples.shape[0]
            out.append(
                (int(mid), int(sr), int(n_frames * 1000 // sr) if sr else 0,
                 int(n_frames), audio_band_features(samples))
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
    audio leg of the image/audio/video triad.

    ``decoder='real'`` parses integer-PCM WAV with stdlib ``wave``:
    true sample_rate/duration/sample-count (``n_samples`` is per-channel
    frames) plus an 8-d descriptor (RMS, zero-crossing rate, 6 rFFT band
    energy fractions). ``decoder='deterministic_fake'`` is the md5 path
    the SQL oracles replay."""
    if decoder == "real":
        kernel = _real_audio_decode
    elif decoder == "deterministic_fake":
        kernel = _fake_audio_decode
    else:
        raise ValueError(f"Unknown decoder: {decoder!r}")
    return media.select("media_id", "content").mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
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
    of any vision encoder.

    ``decoder='real'`` decodes PPM/PGM/BMP, nearest-neighbor resizes with
    numpy (pixel-center sampling — deterministic on every host), and
    re-encodes as binary PPM/PGM. The fake path derives the payload from
    md5 of the source hex + target dims so SQL oracles can replay it.

    One mapInPandas pass; output rows carry the target dims and the new
    binary payload.
    """
    tw, th = int(target_width), int(target_height)
    if decoder == "real":

        def _real_resize(batch_iter):
            import pandas as pd

            from biomedical_data_integration_spark.functions.media import (
                decode_image,
                encode_netpbm,
                resize_nearest,
            )

            for pdf in batch_iter:
                out = []
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    img = resize_nearest(decode_image(bytes(content)), tw, th)
                    out.append((int(mid), tw, th, encode_netpbm(img)))
                yield pd.DataFrame(
                    out, columns=["media_id", "width", "height", "content"]
                )

        return media.select("media_id", "content").mapInPandas(
            _real_resize, RESIZED_SCHEMA
        )
    if decoder != "deterministic_fake":
        raise ValueError(f"Unknown decoder: {decoder!r}")

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
