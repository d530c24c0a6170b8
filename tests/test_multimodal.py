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


# ------------------------------------------- real stdlib codecs (round 5)


def test_ppm_roundtrip_byte_exact():
    import numpy as np

    from faiss_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 8, 3), np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()


def test_ppm_header_grammar():
    import numpy as np

    from faiss_spark.operators.multimodal import decode_ppm

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3   2\n# more\n255\n" + img.tobytes()
    assert (decode_ppm(payload) == img).all()


def test_bmp_roundtrip_byte_exact_with_row_padding():
    import numpy as np

    from faiss_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(6)
    for w, h in [(8, 6), (5, 3), (1, 1), (7, 2)]:  # 5,7 force row padding
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all(), (w, h)


def test_wav_roundtrip_pcm16_and_pcm8():
    import numpy as np

    from faiss_spark.operators.multimodal import decode_wav, encode_wav

    x = np.linspace(-0.9, 0.9, 100)
    got16, sr16 = decode_wav(encode_wav(x, 16000, sampwidth=2))
    assert sr16 == 16000
    assert np.abs(got16 - x).max() <= 1.0 / 32768
    got8, sr8 = decode_wav(encode_wav(x, 8000, sampwidth=1))
    assert sr8 == 8000
    assert np.abs(got8 - x).max() <= 1.0 / 128


def test_image_features_real_ppm(spark):
    import numpy as np

    from faiss_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        encode_ppm,
        image_features,
    )

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (6, 8, 3), np.uint8) for _ in range(4)]
    rows = [
        (i, encode_ppm(img), "ppm", 8, 6, 3) for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    got = {r["id"]: r for r in image_features(df).collect()}  # fake=False!
    for i, img in enumerate(imgs):
        assert got[i]["n_pixels"] == 48
        assert np.allclose(got[i]["mean"], img.astype(float).mean((0, 1)))
        assert np.allclose(got[i]["std"], img.astype(float).std((0, 1)))


def test_audio_features_real_wav(spark):
    import numpy as np

    from faiss_spark.operators.multimodal import (
        AUDIO_SCHEMA,
        audio_features,
        decode_wav,
        encode_wav,
    )

    t = np.arange(400) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(x, 8000, sampwidth=2)
    df = spark.createDataFrame(
        [(0, payload, "wav", 8000, 400)], AUDIO_SCHEMA
    )
    row = audio_features(df).collect()[0]  # fake=False: real decode
    dec, _ = decode_wav(payload)
    dec = dec.astype(np.float64)
    assert abs(row["rms"] - np.sqrt((dec**2).mean())) < 1e-12
    assert abs(row["peak"] - np.abs(dec).max()) < 1e-12
    assert row["duration_sec"] == 400 / 8000


def test_unknown_codec_still_raises(spark):
    import pytest as _pytest

    from faiss_spark.operators.multimodal import decode_audio, decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8", 8, 6, 3, fmt="jpeg")
    with _pytest.raises(NotImplementedError):
        decode_audio(b"fLaC", 100, codec="flac")


def test_png_roundtrip_byte_exact():
    """encode_png → decode_png is identity for gray / RGB / RGBA."""
    import numpy as np

    from faiss_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (11, 7, c), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert (out == img).all()
    # 2-D grayscale input encodes as color type 0
    g = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    assert (decode_png(encode_png(g))[:, :, 0] == g).all()


def test_png_all_five_filters_decode():
    """Hand-build a PNG whose rows use filters 0-4 (forward-filtered per
    the PNG spec §9) and check the decoder reverses each exactly."""
    import struct
    import zlib

    import numpy as np

    from faiss_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(9)
    h, w, c = 5, 6, 3
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8).astype(np.int32)
    stride = w * c
    flat = img.reshape(h, stride)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    body = bytearray()
    for y in range(h):
        f = y % 5
        body.append(f)
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        for x in range(stride):
            a = int(flat[y, x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, cc)}[f]
            body.append((int(flat[y, x]) - pred) & 0xFF)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert (out == img.astype(np.uint8)).all()


def test_png_rejects_bad_crc_and_profiles():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from faiss_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(np.zeros((2, 2, 3), np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png(b"nope")

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # 16-bit depth → loud NotImplementedError, not silent garbage
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_png(deep)


def test_image_features_on_png(spark):
    """The Spark path end-to-end on REAL PNG payloads: per-channel means
    from image_features must equal numpy's on the source arrays."""
    import numpy as np

    from faiss_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        encode_png,
        image_features,
    )

    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(4)]
    rows = [
        (i, encode_png(im), "png", 8, 6, 3) for i, im in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    got = {r["id"]: r["mean"] for r in image_features(df).collect()}
    for i, im in enumerate(imgs):
        assert np.allclose(got[i], im.astype(np.float64).mean(axis=(0, 1)))
