"""Readers/writers for the TexMex .fvecs/.ivecs/.bvecs dataset formats —
SURVEY §2.I (reference contrib/vecs_io.py:14-52).

Format: each record is ``int32 d`` followed by ``d`` elements (float32 /
int32 / uint8). Small files are read with numpy on the driver and
parallelized; for genuinely huge files, ``vecs_iter_chunks`` /
``vecs_to_parquet`` stream fixed-size record blocks with ``np.memmap``
so driver memory stays O(chunk). The formats are not splittable
mid-record without knowing d, so cluster-scale ingestion should convert
to Parquet once (``vecs_to_parquet``) then scan the Parquet — which is
how every other operator here wants its input anyway.

Contract: ``path`` is a DRIVER-LOCAL file (open()/np.memmap — a .fvecs
on S3/HDFS must be fetched first). This is deliberate: TexMex files are
one-off benchmark inputs, not a data plane; index artifacts by contrast
go through the Hadoop FS API (``sources/fsio.py``) and work on any
scheme.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_EXT = {".fvecs": (np.float32, 4), ".ivecs": (np.int32, 4), ".bvecs": (np.uint8, 1)}


def _ext_of(path: str):
    for ext, (dtype, esz) in _EXT.items():
        if path.endswith(ext):
            return dtype, esz
    raise ValueError(f"unknown vecs extension: {path}")


def _record_layout(path: str, elem_size: int) -> tuple[int, int, int]:
    """(d, record_bytes, n_records) — reads only the 4-byte header."""
    size = os.path.getsize(path)
    if size == 0:
        return 0, 0, 0
    with open(path, "rb") as f:
        d = int(np.frombuffer(f.read(4), dtype=np.int32)[0])
    rec = 4 + d * elem_size
    if size % rec:
        raise ValueError(f"{path}: size {size} not a multiple of record {rec}")
    return d, rec, size // rec


def _read_vecs(path: str, dtype, elem_size: int) -> np.ndarray:
    d, rec, n = _record_layout(path, elem_size)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    raw = np.fromfile(path, dtype=np.uint8)
    mat = raw.reshape(n, rec)[:, 4:]
    return np.frombuffer(mat.tobytes(), dtype=dtype).reshape(n, d)


def fvecs_read(path: str) -> np.ndarray:
    return _read_vecs(path, np.float32, 4)


def ivecs_read(path: str) -> np.ndarray:
    return _read_vecs(path, np.int32, 4)


def bvecs_read(path: str) -> np.ndarray:
    return _read_vecs(path, np.uint8, 1)


def fvecs_write(path: str, X: np.ndarray) -> None:
    X = np.ascontiguousarray(X, dtype=np.float32)
    n, d = X.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = X.view(np.int32)
    out.tofile(path)


def vecs_iter_chunks(
    path: str, chunk_rows: int = 100_000
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (row_offset, block) over a vecs file without ever holding
    more than chunk_rows records: the file is memory-mapped and sliced
    per block, so a 100 GB .bvecs streams through O(chunk) memory."""
    dtype, esz = _ext_of(path)
    d, rec, n = _record_layout(path, esz)
    if n == 0:
        return
    mm = np.memmap(path, dtype=np.uint8, mode="r")
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        block = np.asarray(mm[lo * rec : hi * rec]).reshape(hi - lo, rec)[:, 4:]
        yield lo, np.frombuffer(block.tobytes(), dtype=dtype).reshape(hi - lo, d)


def vecs_to_df(
    spark: SparkSession,
    path: str,
    id_offset: int = 0,
    num_partitions: int | None = None,
    chunk_rows: int | None = None,
) -> DataFrame:
    """Read an .fvecs/.bvecs/.ivecs file into DataFrame(id, vec).

    With chunk_rows set, blocks are converted and unioned so peak driver
    memory is O(chunk_rows·d); without it the whole file is read at once
    (fine for the convert-once utility use)."""
    if chunk_rows is not None:
        parts = []
        for lo, X in vecs_iter_chunks(path, chunk_rows):
            rows = [
                (id_offset + lo + i, X[i].astype(float).tolist())
                for i in range(len(X))
            ]
            parts.append(spark.createDataFrame(rows, "id bigint, vec array<float>"))
        if not parts:
            return spark.createDataFrame([], "id bigint, vec array<float>")
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.repartition(num_partitions) if num_partitions else df
    dtype, esz = _ext_of(path)
    X = _read_vecs(path, dtype, esz).astype(np.float32)
    rows = [(id_offset + i, X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "id bigint, vec array<float>")
    return df.repartition(num_partitions) if num_partitions else df


def vecs_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    chunk_rows: int = 100_000,
    id_offset: int = 0,
) -> int:
    """Convert-once ingestion: stream a vecs file into a Parquet vector
    table in chunk_rows appends (constant driver memory). Returns rows
    written. After this, every operator scans Parquet with pushdown —
    the right shape for 100 TB corpora."""
    total = 0
    for lo, X in vecs_iter_chunks(src, chunk_rows):
        rows = [
            (id_offset + lo + i, X[i].astype(float).tolist()) for i in range(len(X))
        ]
        spark.createDataFrame(rows, "id bigint, vec array<float>").write.mode(
            "overwrite" if lo == 0 else "append"
        ).parquet(dest)
        total += len(X)
    return total
