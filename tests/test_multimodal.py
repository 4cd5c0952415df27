"""Multimodal binary-column plumbing: synthesis, decode/features,
resize, frame sampling — all deterministic (fake decoder contract)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media(spark):
    from sdvg_spark.ops.multimodal import synth_media

    df = synth_media(spark.range(0, 50), width=8, height=8, channels=3, payload_bytes=64)
    df = df.cache()
    assert df.count() == 50
    return df


def test_synth_media_schema_and_determinism(spark, media):
    from sdvg_spark.ops.multimodal import synth_media

    assert dict(media.dtypes)["payload"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]
    a = {r.media_id: bytes(r.payload) for r in media.collect()}
    b = {
        r.media_id: bytes(r.payload)
        for r in synth_media(
            spark.range(0, 50), width=8, height=8, channels=3, payload_bytes=64
        ).collect()
    }
    assert a == b
    assert len(set(a.values())) == 50  # distinct payloads per id


def test_image_features(media):
    from sdvg_spark.ops.multimodal import image_features

    rows = image_features(media).collect()
    assert len(rows) == 50
    for r in rows:
        assert (r.width, r.height, r.channels) == (8, 8, 3)
        assert 0 <= r.mean_intensity <= 255
        assert r.std_intensity > 0
        assert 0 < r.entropy <= 8.0


def test_image_features_deterministic(media):
    from sdvg_spark.ops.multimodal import image_features

    a = sorted(map(tuple, image_features(media).collect()))
    b = sorted(map(tuple, image_features(media).collect()))
    assert a == b


def test_strict_decode_raises(media):
    from sdvg_spark.ops.multimodal import image_features

    with pytest.raises(Exception, match="no real image decoder"):
        image_features(media, strict_decode=True).collect()


def test_set_decoder_plugs_in(media):
    import numpy as np

    from sdvg_spark.ops import multimodal as M

    M.set_decoder("image", lambda payload, meta: np.full((4, 4, 1), 7, dtype=np.uint8))
    try:
        r = M.image_features(media).collect()[0]
        assert (r.width, r.height, r.channels) == (4, 4, 1)
        assert r.mean_intensity == 7.0 and r.std_intensity == 0.0
    finally:
        M._DECODERS.pop("image", None)


def test_resize_images(media):
    from sdvg_spark.ops.multimodal import resize_images

    out = resize_images(media, width=4, height=4).collect()
    assert len(out) == 50
    for r in out:
        assert r.meta["width"] == 4 and r.meta["height"] == 4
        assert len(bytes(r.payload)) == 4 * 4 * 3


def test_sample_frames(media):
    from sdvg_spark.ops.multimodal import sample_frames

    out = sample_frames(media, every_ms=250).collect()
    # duration 1000ms at 250ms -> 4 frames per item
    assert len(out) == 50 * 4
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, set()).add(r.frame_ms)
    assert all(v == {0, 250, 500, 750} for v in by_id.values())
    # frames are deterministic functions of (payload, t)
    frames = {(r.media_id, r.frame_ms): bytes(r.frame) for r in out}
    out2 = sample_frames(media, every_ms=250).collect()
    assert frames == {(r.media_id, r.frame_ms): bytes(r.frame) for r in out2}


def test_audio_features_deterministic(spark):
    from sdvg_spark.ops.multimodal import audio_features, synth_media

    media = synth_media(spark.range(0, 50), id_col="id")
    feats = audio_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        # synthetic meta: 1000 ms @ 16 kHz -> 16000 samples
        assert r["n_samples"] == 16000 and r["duration_ms"] == 1000
        assert 0.0 < r["zero_crossing_rate"] < 1.0
        assert r["rms"] > 0 and r["peak"] >= r["rms"]
    # partition-layout determinism
    a = sorted(map(tuple, audio_features(synth_media(spark.range(0, 50).repartition(2))).collect()))
    b = sorted(map(tuple, audio_features(synth_media(spark.range(0, 50).repartition(7))).collect()))
    assert a == b


def test_audio_strict_decode_raises(spark):
    import pytest as _pytest

    from sdvg_spark.ops.multimodal import audio_features, synth_media

    with _pytest.raises(NotImplementedError):
        audio_features(synth_media(spark.range(0, 2)), strict_decode=True)
