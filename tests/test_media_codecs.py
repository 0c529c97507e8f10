"""Real media codecs (PPM/PGM/BMP, PCM WAV, YUV4MPEG2) and the
``decoder="real"`` operator paths over generated fixtures round-tripped
through read_media_binaries."""

import io
import struct
import wave

import numpy as np
import pytest

from biomedical_data_integration_spark.functions.media import (
    audio_band_features,
    decode_image,
    decode_wav,
    encode_netpbm,
    image_stat_features,
    iter_y4m_frames,
    resize_nearest,
)


def make_ppm(img: np.ndarray) -> bytes:
    return encode_netpbm(img)


def make_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-roll an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for r in rows:
        for c in range(w):
            px = img[r, c]
            data += bytes([px[2], px[1], px[0]])  # BGR on disk
        data += b"\x00" * (row_bytes - w * 3)
    header_h = -h if top_down else h
    dib = struct.pack("<IiiHHIIiiII", 40, w, header_h, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    off = 14 + len(dib)
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + dib + bytes(data)


def make_wav(sr=8000, seconds=0.25, freq=440.0, n_channels=1, width=2) -> bytes:
    n = int(sr * seconds)
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(width)
        wf.setframerate(sr)
        frames = np.repeat(x, n_channels) if n_channels > 1 else x
        wf.writeframes(frames.tobytes())
    return buf.getvalue()


def make_y4m(n_frames=6, w=8, h=4, fps=2) -> bytes:
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode())
    for i in range(n_frames):
        out += b"FRAME\n"
        out += bytes([i * 10 % 256] * (w * h))  # Y plane: constant per frame
        out += bytes(2 * (w // 2) * (h // 2))  # U+V planes
    return bytes(out)


@pytest.fixture()
def rgb_img():
    rng = np.random.RandomState(7)
    return rng.randint(0, 256, size=(6, 10, 3), dtype=np.uint8)


def test_ppm_round_trip(rgb_img):
    assert (decode_image(make_ppm(rgb_img)) == rgb_img).all()


def test_pgm_round_trip():
    gray = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    assert (decode_image(encode_netpbm(gray)) == gray).all()


def test_pnm_header_comments_and_whitespace(rgb_img):
    raw = make_ppm(rgb_img)
    # inject a comment line between magic and dims, per netpbm spec
    commented = b"P6\n# generated fixture\n" + raw[3:]
    assert (decode_image(commented) == rgb_img).all()


def test_bmp_bottom_up_and_top_down(rgb_img):
    assert (decode_image(make_bmp(rgb_img)) == rgb_img).all()
    assert (decode_image(make_bmp(rgb_img, top_down=True)) == rgb_img).all()


def test_bmp_row_padding():
    # width 3 -> 9 bytes/row, padded to 12: padding must not shift pixels
    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert (decode_image(make_bmp(img)) == img).all()


def test_decode_image_rejects_unknown_magic():
    with pytest.raises(ValueError, match="unsupported image payload"):
        decode_image(b"\x89PNG\r\n\x1a\nrest")


def test_resize_nearest_exact_downsample():
    # 4x4 checker -> 2x2 picks pixel centers deterministically
    img = np.zeros((4, 4, 1), dtype=np.uint8)
    img[2:, :, 0] = 200
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 1)
    assert small[0, 0, 0] == 0 and small[1, 0, 0] == 200
    up = resize_nearest(small, 4, 4)  # upsample replicates
    assert up.shape == (4, 4, 1)


def test_image_stat_features_known_values():
    img = np.full((4, 4, 3), 255, dtype=np.uint8)
    f = image_stat_features(img)
    assert len(f) == 8
    assert f[:3] == [1.0, 1.0, 1.0] and f[3] == 0.0  # means 1, std 0
    assert f[4:] == [0.0, 0.0, 0.0, 1.0]  # all mass in the top gray bin


def test_wav_decode_and_features():
    sr, nch, samples = decode_wav(make_wav(sr=16000, seconds=0.5))
    assert (sr, nch) == (16000, 1)
    assert samples.shape == (8000, 1)
    f = audio_band_features(samples)
    assert len(f) == 8
    assert 0.3 < f[0] < 0.4  # RMS of a 0.5-amplitude sine ~ 0.3536
    # 440 Hz at sr 16000: nearly all spectral mass in the lowest band
    assert f[2] > 0.95 and sum(f[2:]) == pytest.approx(1.0, abs=1e-6)


def test_wav_stereo_and_8bit():
    sr, nch, samples = decode_wav(make_wav(n_channels=2))
    assert nch == 2 and samples.shape[1] == 2
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes([128, 255, 0, 128]))
    sr, _, s = decode_wav(buf.getvalue())
    assert s[:, 0] == pytest.approx([0.0, 127 / 128, -1.0, 0.0])


def test_y4m_frame_iteration():
    frames = list(iter_y4m_frames(make_y4m(n_frames=4, w=8, h=4, fps=2)))
    assert [i for i, _, _ in frames] == [0, 1, 2, 3]
    assert [t for _, t, _ in frames] == [0.0, 0.5, 1.0, 1.5]
    assert all(y.shape == (4, 8) for _, _, y in frames)
    assert frames[2][2][0, 0] == 20  # Y plane content survives


# ------------------------------------------------- Spark operator paths


@pytest.fixture()
def media_dir(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    (tmp_path / "a.ppm").write_bytes(make_ppm(img))
    (tmp_path / "b.bmp").write_bytes(make_bmp(img))
    (tmp_path / "c.wav").write_bytes(make_wav(sr=8000, seconds=0.25))
    (tmp_path / "d.y4m").write_bytes(make_y4m(n_frames=6, w=8, h=4, fps=2))
    return tmp_path, img


def test_read_media_binaries_and_real_decoders(spark, media_dir):
    from biomedical_data_integration_spark.operators.multimodal import (
        decode_image_features,
        extract_audio_features,
        resize_images,
        sample_video_frames,
    )
    from biomedical_data_integration_spark.sources.readers import (
        read_media_binaries,
    )

    path, img = media_dir
    media = read_media_binaries(spark, str(path))
    kinds = {r["meta"]["path"].rsplit("/", 1)[-1]: r["media_type"]
             for r in media.collect()}
    assert kinds == {"a.ppm": "image", "b.bmp": "image",
                     "c.wav": "audio", "d.y4m": "video"}

    images = media.where("media_type = 'image'")
    feats = decode_image_features(images, decoder="real").collect()
    assert len(feats) == 2
    for r in feats:
        assert (r["width"], r["height"], r["n_channels"]) == (12, 16, 3)
    # PPM and BMP carry the SAME pixels -> identical stat features
    f1, f2 = (r["features"] for r in feats)
    assert f1 == f2

    audio = media.where("media_type = 'audio'")
    (a,) = extract_audio_features(audio, decoder="real").collect()
    assert a["sample_rate"] == 8000
    assert a["n_samples"] == 2000 and a["duration_ms"] == 250
    assert len(a["features"]) == 8

    video = media.where("media_type = 'video'")
    frames = sorted(
        sample_video_frames(video, every_n_seconds=1.0, decoder="real").collect(),
        key=lambda r: r["frame_idx"],
    )
    # 6 frames at 2 fps = 3 s of video; 1 s sampling -> frames 0, 2, 4
    assert [r["frame_idx"] for r in frames] == [0, 2, 4]
    assert [r["ts_seconds"] for r in frames] == [0.0, 1.0, 2.0]
    y = decode_image(bytes(frames[1]["frame"]))
    assert y.shape == (4, 8, 1) and y[0, 0, 0] == 20

    resized = {r["media_id"]: r for r in
               resize_images(images, 6, 8, decoder="real").collect()}
    for r in resized.values():
        out = decode_image(bytes(r["content"]))
        assert out.shape == (8, 6, 3)
        assert (out == resize_nearest(img, 6, 8)).all()


def test_read_media_binaries_glob_filter(spark, media_dir):
    from biomedical_data_integration_spark.sources.readers import (
        read_media_binaries,
    )

    path, _ = media_dir
    only_wav = read_media_binaries(spark, str(path), pattern="*.wav")
    assert only_wav.count() == 1
    forced = read_media_binaries(spark, str(path), media_type="image")
    assert {r["media_type"] for r in forced.collect()} == {"image"}


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _has_soundfile() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed")
def test_png_roundtrip_via_optional_pillow():
    import io

    import numpy as np
    from PIL import Image

    from biomedical_data_integration_spark.functions.media import decode_image

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    out = decode_image(buf.getvalue())
    assert out.shape == (4, 4, 3)
    assert (out == img).all()  # PNG is lossless


@pytest.mark.skipif(not _has_soundfile(), reason="soundfile not installed")
def test_flac_roundtrip_via_optional_soundfile():
    import io

    import numpy as np
    import soundfile as sf

    from biomedical_data_integration_spark.functions.media import decode_wav

    t = np.arange(800) / 8000.0
    mono = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    buf = io.BytesIO()
    sf.write(buf, mono, 8000, format="FLAC")
    sr, nch, samples = decode_wav(buf.getvalue())
    assert (sr, nch) == (8000, 1)
    assert np.abs(samples[:, 0] - mono).max() < 1e-3  # FLAC is lossless-ish at 16-bit


def test_unsupported_payloads_raise_with_guidance_when_libs_absent():
    from biomedical_data_integration_spark.functions.media import (
        decode_image,
        decode_wav,
    )

    if not _has_pil():
        with pytest.raises(ValueError, match="Pillow"):
            decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    if not _has_soundfile():
        with pytest.raises(ValueError, match="soundfile"):
            decode_wav(b"fLaCxxxxyyyy")
