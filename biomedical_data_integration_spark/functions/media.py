"""Pure-Python media codecs for uncompressed formats — zero new deps.

The container has no PIL/ffmpeg/torchaudio, but the classic uncompressed
interchange formats parse with stdlib + numpy alone:

- images: PPM (P6) / PGM (P5) binary netpbm, and uncompressed BMP
  (BITMAPINFOHEADER, 8/24/32-bit, BI_RGB)
- audio: PCM WAV via stdlib ``wave`` (8/16/32-bit integer PCM)
- video: YUV4MPEG2 (``.y4m``) — the plain-header raw-frame format every
  ffmpeg/mplayer pipeline can emit (``ffmpeg -i in.mp4 out.y4m``)

These back the ``decoder="real"`` paths in
:mod:`biomedical_data_integration_spark.operators.multimodal`; compressed
codecs (JPEG/MP3/H.264) would slot into the same functions when codec
libraries exist on the executors. Everything here is deterministic —
same bytes in, same arrays/features out — so results are reproducible
across runs and cluster sizes.

Reference parity note: the reference engine (bdi-kit) has no media
pipeline at all; this family is engine-claimed surface for training-data
preparation at scale.
"""

from __future__ import annotations

import io
import wave
from typing import List, Tuple

import numpy as np

__all__ = [
    "decode_image",
    "encode_netpbm",
    "decode_wav",
    "audio_band_features",
    "image_stat_features",
    "iter_y4m_frames",
    "resize_nearest",
]


# ---------------------------------------------------------------- images


def _read_pnm_header(b: bytes) -> Tuple[str, int, int, int, int]:
    """Parse a binary netpbm header (P5/P6): returns
    (magic, width, height, maxval, data_offset). Whitespace and
    ``#``-comment handling per the netpbm spec."""
    magic = b[:2].decode("ascii")
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace and comment lines
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    # exactly ONE whitespace byte separates maxval from raster data
    pos += 1
    w, h, maxval = fields
    return magic, w, h, maxval, pos


def _decode_pnm(b: bytes) -> np.ndarray:
    magic, w, h, maxval, off = _read_pnm_header(b)
    if maxval > 255:
        raise ValueError(f"netpbm maxval {maxval} > 255 not supported")
    ch = 3 if magic == "P6" else 1
    need = w * h * ch
    raster = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
    return raster.reshape(h, w, ch)


def _decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed BMP (BI_RGB) with a BITMAPINFOHEADER-or-later DIB
    header; 8-bit paletted (treated as grayscale index), 24-bit BGR, and
    32-bit BGRA. Rows are 4-byte aligned and stored bottom-up (top-down
    when height is negative, per the spec)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"BMP core-header size {hdr_size} not supported")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if compression != 0:
        raise ValueError(f"BMP compression {compression} not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP bpp {bpp} not supported")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * row_bytes
        rows.append(np.frombuffer(b, np.uint8, count=w * bpp // 8, offset=off))
    img = np.stack(rows if top_down else rows[::-1])
    if bpp == 8:
        return img.reshape(h, w, 1)
    img = img.reshape(h, w, bpp // 8)
    return img[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped


def _pil_decode(b: bytes):
    """Optional-dependency leg: decode compressed codecs (JPEG/PNG/GIF/
    WebP/...) through Pillow WHEN it is importable on the executor;
    returns None when Pillow is absent so the caller can raise the
    stdlib-path guidance error instead. Import is lazy and per-call-site
    cached by Python's module cache — no import cost on the stdlib path."""
    try:
        from PIL import Image  # type: ignore
    except ImportError:
        return None
    img = Image.open(io.BytesIO(b))
    if img.mode not in ("L", "RGB"):
        img = img.convert("RGB" if ("A" in img.mode or len(img.mode) > 1) else "L")
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def decode_image(b: bytes) -> np.ndarray:
    """Decode image bytes to a ``(H, W, C) uint8`` array (C=1 grayscale,
    C=3 RGB). PPM/PGM/BMP decode dependency-free (stdlib/numpy, the
    deterministic contract the oracles rely on); other magics fall
    through to Pillow when it is installed on executors, else raise
    ValueError with guidance."""
    b = bytes(b)
    if b[:2] in (b"P5", b"P6"):
        return _decode_pnm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    pil = _pil_decode(b)
    if pil is not None:
        return pil
    raise ValueError(
        f"unsupported image payload (magic {b[:2]!r}); the dependency-free "
        "decoder handles PPM/PGM/BMP — compressed codecs (JPEG/PNG/...) "
        "decode automatically when Pillow is installed on executors"
    )


def encode_netpbm(img: np.ndarray) -> bytes:
    """Encode a ``(H, W, C) uint8`` array as binary PPM (C=3) / PGM (C=1)."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic, dependency-free kernel;
    pixel-center sampling so the result is translation-stable)."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return img[ys][:, xs]


def image_stat_features(img: np.ndarray) -> List[float]:
    """8-d deterministic image descriptor: per-channel means (R,G,B —
    grayscale repeats the single channel), grayscale std, and a 4-bin
    grayscale histogram (fractions). All in [0, 1]; float32-rounded."""
    f = img.astype(np.float64) / 255.0
    if f.shape[2] == 1:
        means = [float(f.mean())] * 3
        gray = f[:, :, 0]
    else:
        means = [float(f[:, :, i].mean()) for i in range(3)]
        gray = f.mean(axis=2)
    hist, _ = np.histogram(gray, bins=4, range=(0.0, 1.0))
    frac = hist / gray.size
    feats = means + [float(gray.std())] + [float(x) for x in frac]
    return [float(np.float32(x)) for x in feats]


# ----------------------------------------------------------------- audio


def _soundfile_decode(b: bytes):
    """Optional-dependency leg: decode compressed audio (FLAC/OGG/...)
    through soundfile WHEN importable on the executor; returns None when
    absent so the caller raises the stdlib-path guidance error."""
    try:
        import soundfile as sf  # type: ignore
    except ImportError:
        return None
    data, sr = sf.read(io.BytesIO(b), dtype="float64", always_2d=True)
    return int(sr), int(data.shape[1]), data


def decode_wav(b: bytes) -> Tuple[int, int, np.ndarray]:
    """Parse audio bytes: integer-PCM WAV decodes dependency-free with
    stdlib ``wave`` (the deterministic contract the oracles rely on);
    non-WAV payloads (FLAC/OGG/...) fall through to soundfile when it is
    installed on executors, else raise with guidance. Returns
    ``(sample_rate, n_channels, samples)`` where samples is float64 in
    [-1, 1], shape ``(n_frames, n_channels)``."""
    raw_b = bytes(b)
    if raw_b[:4] != b"RIFF":
        decoded = _soundfile_decode(raw_b)
        if decoded is not None:
            return decoded
        raise ValueError(
            f"unsupported audio payload (magic {raw_b[:4]!r}); the "
            "dependency-free decoder handles integer-PCM WAV — compressed "
            "codecs (FLAC/OGG/...) decode automatically when soundfile is "
            "installed on executors"
        )
    with wave.open(io.BytesIO(bytes(b)), "rb") as wf:
        sr = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # 8-bit WAV is unsigned
        x = np.frombuffer(raw, np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"WAV sample width {width} not supported")
    return sr, nch, x.reshape(-1, nch)


def audio_band_features(samples: np.ndarray) -> List[float]:
    """8-d deterministic audio descriptor: RMS level, zero-crossing rate,
    and the energy fractions of 6 equal rFFT bands over the mono mix.
    Same bytes -> same floats on every host (float32-rounded)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if mono.size == 0:
        return [0.0] * 8
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono)) ** 2
    bands = np.array_split(spec, 6)
    total = float(spec.sum())
    fracs = [float(bnd.sum() / total) if total > 0 else 0.0 for bnd in bands]
    return [float(np.float32(x)) for x in [rms, zcr] + fracs]


# ----------------------------------------------------------------- video


def iter_y4m_frames(b: bytes):
    """Iterate a YUV4MPEG2 stream: yields
    ``(frame_idx, ts_seconds, y_plane)`` with ``y_plane`` a
    ``(H, W) uint8`` luma array. Supports C420*, C422, C444 and Cmono
    chroma subsampling (chroma planes are skipped — luma is the frame
    sample). Frame rate comes from the mandatory ``F<num>:<den>`` tag."""
    b = bytes(b)
    nl = b.index(0x0A)
    header = b[:nl].decode("ascii").split(" ")
    if header[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    num, den = 30, 1
    chroma = "420"
    for tag in header[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("F"):
            num, den = (int(x) for x in tag[1:].split(":"))
        elif tag.startswith("C"):
            chroma = tag[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if chroma.startswith("420"):
        chroma_bytes = 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("422"):
        chroma_bytes = 2 * ((w // 2) * h)
    elif chroma.startswith("444"):
        chroma_bytes = 2 * (w * h)
    elif chroma.startswith("mono"):
        chroma_bytes = 0
    else:
        raise ValueError(f"y4m chroma {chroma!r} not supported")
    fps = num / den
    pos, idx = nl + 1, 0
    ysize = w * h
    while pos < len(b):
        fnl = b.index(0x0A, pos)
        if not b[pos:fnl].startswith(b"FRAME"):
            raise ValueError("y4m frame marker missing")
        pos = fnl + 1
        y = np.frombuffer(b, np.uint8, count=ysize, offset=pos).reshape(h, w)
        yield idx, idx / fps, y
        pos += ysize + chroma_bytes
        idx += 1
