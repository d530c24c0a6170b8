"""Multimodal (image/audio/video) column processing for training-data
pipelines.

Media lives in DataFrames as opaque ``payload BINARY`` plus typed
metadata columns — the same "table + small artifact" discipline as the
vector operators. All Spark-side plumbing here is real and tested:
schemas, Arrow batch shapes, ``mapInPandas`` signatures, partitioning,
and the metadata fast paths. Only the actual media CODECS are stubbed
(this container has no image/audio libraries): decode functions raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic synthetic decode so the downstream plumbing (feature
extraction, resize bookkeeping, frame sampling) can be exercised and
asserted end-to-end.

Schema conventions:
  images : (id BIGINT, payload BINARY, format STRING, width INT,
            height INT, channels INT)
  audio  : (id BIGINT, payload BINARY, codec STRING, sample_rate INT,
            n_samples BIGINT)
  video  : (id BIGINT, payload BINARY, codec STRING, fps DOUBLE,
            n_frames BIGINT, width INT, height INT)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "id bigint, payload binary, format string, width int, height int, "
    "channels int"
)
AUDIO_SCHEMA = (
    "id bigint, payload binary, codec string, sample_rate int, n_samples bigint"
)
VIDEO_SCHEMA = (
    "id bigint, payload binary, codec string, fps double, n_frames bigint, "
    "width int, height int"
)


def _fake_decode_image(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: pixels derived
    from the payload bytes, tiled to (height, width, channels) uint8."""
    src = np.frombuffer(payload, dtype=np.uint8)
    if src.size == 0:
        src = np.zeros(1, dtype=np.uint8)
    need = height * width * channels
    reps = -(-need // src.size)
    return np.tile(src, reps)[:need].reshape(height, width, channels)


def decode_image(payload: bytes, width: int, height: int, channels: int,
                 fake: bool = False) -> np.ndarray:
    """STUB: real decoding needs an image library not present in this
    container. The Spark plumbing calls this through image_features /
    resize_images; pass fake=True there to exercise it."""
    if fake:
        return _fake_decode_image(payload, width, height, channels)
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. Pillow); "
        "run with fake=True for the deterministic synthetic decoder"
    )


def image_features(
    df: DataFrame, fake: bool = False, batch_note: str = "mean/std per channel"
) -> DataFrame:
    """Per-image channel statistics: (id, mean array<double>,
    std array<double>, n_pixels bigint).

    The Arrow batch is the unit of work: one decode per row, numpy stats
    vectorized per image. Partitioning/pushdown: only (id, payload, width,
    height, channels) are read — column pruning reaches the parquet scan."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            means, stds, npx = [], [], []
            # decode is inherently per-row; zip over raw columns (no
            # pandas Series boxing per cell, unlike iterrows)
            cols = (pdf["payload"], pdf["width"], pdf["height"], pdf["channels"])
            for payload, w, h, c in zip(*(col.to_numpy() for col in cols)):
                img = decode_image(payload, w, h, c, fake).astype(np.float64)
                means.append(img.mean(axis=(0, 1)).tolist())
                stds.append(img.std(axis=(0, 1)).tolist())
                npx.append(img.shape[0] * img.shape[1])
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "mean": means,
                    "std": stds,
                    "n_pixels": np.asarray(npx, np.int64),
                }
            )

    src = df.select("id", "payload", "width", "height", "channels")
    return src.mapInPandas(
        feats,
        schema="id bigint, mean array<double>, std array<double>, n_pixels bigint",
    )


def _fake_decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in for a real audio decoder: int16 PCM derived
    from the payload bytes, tiled/truncated to n_samples, scaled to
    [-1, 1) float32."""
    src = np.frombuffer(payload, dtype=np.uint8)
    if src.size == 0:
        src = np.zeros(1, dtype=np.uint8)
    reps = -(-int(n_samples) // src.size)
    pcm = np.tile(src, reps)[:n_samples].astype(np.int32) * 257 - 32768
    return pcm.astype(np.float32) / 32768.0


def decode_audio(payload: bytes, n_samples: int, fake: bool = False) -> np.ndarray:
    """STUB: real decoding needs an audio library not present in this
    container. The Spark plumbing calls this through audio_features;
    pass fake=True there to exercise it."""
    if fake:
        return _fake_decode_audio(payload, n_samples)
    raise NotImplementedError(
        "audio decode requires an audio library (e.g. soundfile/ffmpeg); "
        "run with fake=True for the deterministic synthetic decoder"
    )


def audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Per-clip waveform statistics: (id, rms double, peak double,
    zero_crossings bigint, duration_sec double).

    Same discipline as image_features: the Arrow batch is the unit of
    work, decode is per-row, stats are vectorized numpy over the decoded
    waveform. Column pruning: only (id, payload, sample_rate, n_samples)
    are read."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rms, peak, zc, dur = [], [], [], []
            cols = (pdf["payload"], pdf["sample_rate"], pdf["n_samples"])
            for payload, sr, ns in zip(*(col.to_numpy() for col in cols)):
                wave = decode_audio(payload, ns, fake).astype(np.float64)
                rms.append(float(np.sqrt(np.mean(wave**2))) if wave.size else 0.0)
                peak.append(float(np.abs(wave).max()) if wave.size else 0.0)
                zc.append(int(np.count_nonzero(np.signbit(wave[1:]) != np.signbit(wave[:-1]))))
                dur.append(float(ns) / float(sr) if sr else 0.0)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "rms": rms,
                    "peak": peak,
                    "zero_crossings": np.asarray(zc, np.int64),
                    "duration_sec": dur,
                }
            )

    src = df.select("id", "payload", "sample_rate", "n_samples")
    return src.mapInPandas(
        feats,
        schema=(
            "id bigint, rms double, peak double, zero_crossings bigint, "
            "duration_sec double"
        ),
    )


def make_fake_audio(spark, n: int, sample_rate: int = 16000,
                    n_samples: int = 4000, seed: int = 11) -> DataFrame:
    """Deterministic synthetic audio table (for tests/demos)."""
    rng = np.random.default_rng(seed)
    rows = [
        (
            i,
            bytes(rng.integers(0, 256, 64, dtype=np.uint8).tolist()),
            "fake",
            sample_rate,
            n_samples,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, AUDIO_SCHEMA)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, fake: bool = False
) -> DataFrame:
    """Nearest-neighbor resize: returns the images table with payload
    replaced by the raw resized pixel buffer and width/height updated.
    (Real pipelines re-encode; the plumbing — new payload bytes, updated
    metadata, preserved schema — is what is exercised here.)"""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads, fmts = [], []
            cols = (pdf["payload"], pdf["width"], pdf["height"], pdf["channels"])
            for payload, w, h, c in zip(*(col.to_numpy() for col in cols)):
                img = decode_image(payload, w, h, c, fake)
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                resized = img[ys][:, xs]
                payloads.append(resized.tobytes())
                fmts.append("raw")
            out = pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "payload": payloads,
                    "format": fmts,
                    "width": np.full(len(pdf), out_w, np.int32),
                    "height": np.full(len(pdf), out_h, np.int32),
                    "channels": pdf["channels"].to_numpy(np.int32),
                }
            )
            yield out

    return df.select(
        "id", "payload", "format", "width", "height", "channels"
    ).mapInPandas(do, schema=IMAGE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_n: int = 30
) -> DataFrame:
    """Frame-sampling BOOKKEEPING (pure SQL, no decode): explode each
    video row into (id, frame_no, ts_sec) for frames 0, n, 2n, … —
    the shuffle-free planning step a real pipeline runs before paying for
    decode; the decode itself would be a mapInPandas like image_features."""
    frame_nos = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), (F.col("n_frames") - 1).cast("int"), F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        "id",
        F.explode(frame_nos).alias("frame_no"),
        "fps",
    ).select(
        "id",
        "frame_no",
        F.round(F.col("frame_no") / F.col("fps"), 6).alias("ts_sec"),
    )


def audio_windows(
    df: DataFrame, window_samples: int = 16000, hop: int = 8000
) -> DataFrame:
    """Audio windowing bookkeeping (pure SQL): (id, win_no, start_sample,
    end_sample) covering n_samples with the given hop."""
    n_wins = F.greatest(
        F.ceil((F.col("n_samples") - window_samples) / hop + 1), F.lit(1)
    ).cast("int")
    return df.select(
        "id",
        F.explode(F.sequence(F.lit(0), n_wins - 1)).alias("win_no"),
        "n_samples",
    ).select(
        "id",
        "win_no",
        (F.col("win_no") * hop).alias("start_sample"),
        F.least(
            F.col("win_no") * hop + window_samples, F.col("n_samples")
        ).alias("end_sample"),
    )


def make_fake_images(spark, n: int, width: int = 8, height: int = 6,
                     channels: int = 3, seed: int = 7) -> DataFrame:
    """Deterministic synthetic images table (for tests/demos)."""
    rng = np.random.default_rng(seed)
    rows = [
        (
            i,
            bytes(rng.integers(0, 256, 32, dtype=np.uint8).tolist()),
            "fake",
            width,
            height,
            channels,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, IMAGE_SCHEMA)
