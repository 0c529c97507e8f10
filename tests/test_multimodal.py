"""Multimodal plumbing: binary columns + mapInPandas decode contract.
Codec work is stubbed (deterministic fake) — the Spark-side schema/batch
behavior is what's under test."""

import pytest

from biomedical_data_integration_spark.operators.multimodal import (
    attach_binary_content,
    decode_image_features,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame([(1, "cat"), (2, "dog")], ["id", "payload"])
    return attach_binary_content(df, "id", "payload", "image")


def test_attach_binary_content_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "content", "media_type", "meta",
    ]
    rows = media.collect()
    assert all(isinstance(r["content"], (bytes, bytearray)) for r in rows)
    assert all(r["meta"]["n_bytes"] == "16" for r in rows)  # md5 = 16 bytes


def test_decode_image_features_deterministic(media):
    a = {r["media_id"]: r for r in decode_image_features(media).collect()}
    b = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert set(a) == {1, 2}
    for mid in a:
        assert a[mid]["features"] == b[mid]["features"]
        assert len(a[mid]["features"]) == 8
        assert 64 <= a[mid]["width"] < 256
        assert a[mid]["n_channels"] == 3


def test_unknown_decoder_rejected(media):
    with pytest.raises(ValueError):
        decode_image_features(media, decoder="bogus")


def test_sample_video_frames_contract(media):
    out = sample_video_frames(media, every_n_seconds=2.0)
    rows = out.collect()
    assert len(rows) == 6  # 3 fake frames per media row
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    for frames in per.values():
        assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]
        assert sorted(f["ts_seconds"] for f in frames) == [0.0, 2.0, 4.0]


def test_extract_audio_features_plumbing(spark):
    from biomedical_data_integration_spark.operators.multimodal import (
        attach_binary_content,
        extract_audio_features,
    )

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world")], "doc_id bigint, text string"
    )
    media = attach_binary_content(docs, "doc_id", "text", "audio")
    out = extract_audio_features(media).collect()
    assert len(out) == 2
    for r in out:
        assert 8000 <= r["sample_rate"] <= 40000
        assert r["sample_rate"] % 8000 == 0
        assert 500 <= r["duration_ms"] < 60500
        assert r["n_samples"] == r["sample_rate"] * r["duration_ms"] // 1000
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # determinism
    again = extract_audio_features(media).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_extract_audio_features_real_rejects_non_wav(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.multimodal import (
        attach_binary_content,
        extract_audio_features,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    media = attach_binary_content(docs, "doc_id", "text", "audio")
    # real decoder over a non-WAV payload surfaces the codec error
    with _pytest.raises(Exception):
        extract_audio_features(media, decoder="real").collect()


def test_resize_images_plumbing_and_determinism(spark):
    from biomedical_data_integration_spark.operators.multimodal import (
        attach_binary_content,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb")], "doc_id bigint, text string"
    )
    media = attach_binary_content(docs, "doc_id", "text", "image")
    out = resize_images(media, 224, 224).collect()
    assert {(r["width"], r["height"]) for r in out} == {(224, 224)}
    assert len({bytes(r["content"]) for r in out}) == 2  # distinct payloads
    again = resize_images(media, 224, 224).collect()
    assert sorted((r["media_id"], bytes(r["content"])) for r in out) == sorted(
        (r["media_id"], bytes(r["content"])) for r in again
    )
    # different target -> different payload (dims are part of the seed)
    other = resize_images(media, 64, 64).collect()
    assert {bytes(r["content"]) for r in other}.isdisjoint(
        {bytes(r["content"]) for r in out}
    )
