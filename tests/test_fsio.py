"""sources/fsio.py — the Hadoop-FS sidecar IO layer every index
save/load now routes through. Tested directly (persist round-trips
cover it indirectly): bytes/json/npy round-trips, parent creation,
overwrite, exists/delete, and the loud missing-file error."""

import numpy as np
import pytest

from faiss_spark.sources import fsio


def test_bytes_roundtrip_creates_parents(spark, tmp_path):
    p = str(tmp_path / "a" / "b" / "blob.bin")
    fsio.write_bytes(spark, p, b"\x00\x01hadoop\xff")
    assert fsio.read_bytes(spark, p) == b"\x00\x01hadoop\xff"
    assert fsio.exists(spark, p)


def test_json_npy_roundtrip_and_overwrite(spark, tmp_path):
    p = str(tmp_path / "meta.json")
    fsio.write_json(spark, p, {"k": [1, 2], "s": "x"})
    assert fsio.read_json(spark, p) == {"k": [1, 2], "s": "x"}
    fsio.write_json(spark, p, {"k": 3})  # overwrite, not append
    assert fsio.read_json(spark, p) == {"k": 3}
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)[:, ::2]  # non-contig
    np_p = str(tmp_path / "arr.npy")
    fsio.write_npy(spark, np_p, arr)
    out = fsio.read_npy(spark, np_p)
    assert out.dtype == arr.dtype and np.array_equal(out, arr)


def test_exists_delete_and_missing_error(spark, tmp_path):
    p = str(tmp_path / "gone.json")
    assert not fsio.exists(spark, p)
    assert fsio.delete(spark, p) is False  # deleting nothing is not an error
    fsio.write_json(spark, p, {})
    assert fsio.delete(spark, p) is True
    assert not fsio.exists(spark, p)
    with pytest.raises(FileNotFoundError):
        fsio.read_bytes(spark, p)
    # recursive directory delete (the stale-sidecar path in NSG save)
    d = tmp_path / "side"
    fsio.write_json(spark, str(d / "x.json"), {})
    assert fsio.delete(spark, str(d), recursive=True) is True
    assert not fsio.exists(spark, str(d))
