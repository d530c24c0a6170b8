"""Object-store-safe sidecar IO (reference parity: faiss index_io writes
one artifact stream next to the index data, index_io.h:38-56 — here "next
to" means the SAME Hadoop filesystem/prefix as the parquet codes tables).

Index ``save()``/``load()`` writes two kinds of artifacts: the big codes
tables (parquet via Spark — already work on any Hadoop-compatible FS:
file://, hdfs://, s3a://, gs://, abfs://) and small driver-side sidecars
(centroid ``.npy`` arrays, ``.json`` metadata). Writing the sidecars with
bare ``open()``/``np.save`` binds them to the driver's POSIX filesystem —
on a real cluster where ``path`` is ``s3a://bucket/index`` every save
would break, and a save to a driver-local path would be invisible to a
different driver reloading the index. These helpers route the sidecar
bytes through the Hadoop FileSystem API (via the session JVM), so the
scheme of the user's path decides where they land, exactly as it does for
the parquet tables written beside them.

All sidecars are small by construction (centroids/codebooks/meta — KBs to
a few MB), so whole-buffer reads/writes through the driver are the right
shape; the data plane never passes through here.
"""

from __future__ import annotations

import io
import json
from typing import Any

import numpy as np


def _fs_path(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def write_bytes(spark, path: str, data: bytes) -> None:
    """Create-or-overwrite ``path`` with ``data`` on whatever filesystem
    its scheme names (parents are created, as Hadoop ``create`` does)."""
    fs, hpath = _fs_path(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_bytes(spark, path: str) -> bytes:
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    stream = fs.open(hpath)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data)


def exists(spark, path: str) -> bool:
    fs, hpath = _fs_path(spark, path)
    return bool(fs.exists(hpath))


def delete(spark, path: str, recursive: bool = True) -> bool:
    """Delete ``path`` if present (used to clear sidecars of a DIFFERENT
    storage mode left by a previous save at the same prefix — a stale
    ``_pq`` table next to a new flat save would otherwise be picked up by
    load and mis-typed). Returns True when something was removed."""
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, recursive))


def write_json(spark, path: str, obj: Any) -> None:
    write_bytes(spark, path, json.dumps(obj).encode("utf-8"))


def read_json(spark, path: str) -> Any:
    return json.loads(read_bytes(spark, path).decode("utf-8"))


def write_npy(spark, path: str, arr: np.ndarray) -> None:
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(arr))
    write_bytes(spark, path, buf.getvalue())


def read_npy(spark, path: str) -> np.ndarray:
    return np.load(io.BytesIO(read_bytes(spark, path)))
