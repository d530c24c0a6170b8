"""Multimodal plumbing: schemas, batch shapes, deterministic fake decode,
pure-SQL frame/window bookkeeping. The real codecs are stubbed (no media
libs in the container) — these tests pin the Spark-side contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.multimodal import (
    audio_features,
    audio_windows,
    decode_audio,
    decode_image,
    image_features,
    make_fake_audio,
    make_fake_images,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def images(spark):
    return make_fake_images(spark, n=20, width=8, height=6, channels=3)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01", 4, 4, 3)


def test_image_features_shapes(images):
    feats = image_features(images, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["mean"]) == 3 and len(r["std"]) == 3
        assert r["n_pixels"] == 8 * 6
        assert all(0 <= m <= 255 for m in r["mean"])


def test_image_features_deterministic(images):
    a = sorted(map(tuple, image_features(images, fake=True).collect()))
    b = sorted(map(tuple, image_features(images, fake=True).collect()))
    assert a == b


def test_resize_updates_metadata_and_payload(images):
    out = resize_images(images, out_w=4, out_h=2, fake=True)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r["width"], r["height"]) == (4, 2)
        assert len(r["payload"]) == 4 * 2 * 3  # raw pixel buffer
        assert r["format"] == "raw"


def test_video_frame_sampling_sql_only(spark):
    vids = spark.createDataFrame(
        [(1, b"", "h264", 30.0, 100, 640, 480), (2, b"", "h264", 25.0, 10, 320, 240)],
        "id bigint, payload binary, codec string, fps double, n_frames bigint, width int, height int",
    )
    frames = sample_video_frames(vids, every_n=30).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["id"], []).append((r["frame_no"], r["ts_sec"]))
    assert sorted(by_vid[1]) == [(0, 0.0), (30, 1.0), (60, 2.0), (90, 3.0)]
    assert sorted(by_vid[2]) == [(0, 0.0)]


def test_audio_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01", 100)


def test_audio_features_shapes_and_determinism(spark):
    aud = make_fake_audio(spark, n=15, sample_rate=8000, n_samples=2000)
    rows = audio_features(aud, fake=True).collect()
    assert len(rows) == 15
    for r in rows:
        assert 0.0 < r["rms"] <= 1.0
        assert r["rms"] <= r["peak"] <= 1.0
        assert 0 <= r["zero_crossings"] < 2000
        assert r["duration_sec"] == 2000 / 8000
    again = sorted(map(tuple, audio_features(aud, fake=True).collect()))
    assert sorted(map(tuple, rows)) == again


def test_audio_windows_cover_samples(spark):
    aud = spark.createDataFrame(
        [(1, b"", "pcm", 16000, 40000)],
        "id bigint, payload binary, codec string, sample_rate int, n_samples bigint",
    )
    wins = sorted(
        (r["win_no"], r["start_sample"], r["end_sample"])
        for r in audio_windows(aud, 16000, 8000).collect()
    )
    assert wins[0] == (0, 0, 16000)
    assert wins[-1][2] == 40000  # last window clamps to n_samples
    # hop coverage: starts are 0, 8000, 16000, 24000
    assert [w[1] for w in wins] == [0, 8000, 16000, 24000]
