"""TexMex vecs formats: roundtrip, chunked streaming, parquet conversion
(reference contrib/vecs_io.py — different API, shared on-disk format)."""

import numpy as np
import pytest

from faiss_spark.sources.vecs_io import (
    fvecs_read,
    fvecs_write,
    vecs_iter_chunks,
    vecs_to_df,
    vecs_to_parquet,
)


@pytest.fixture(scope="module")
def fvecs_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    X = rng.standard_normal((257, 12)).astype(np.float32)
    p = str(tmp_path_factory.mktemp("vecs") / "x.fvecs")
    fvecs_write(p, X)
    return p, X


def test_fvecs_roundtrip(fvecs_file):
    p, X = fvecs_file
    np.testing.assert_array_equal(fvecs_read(p), X)


def test_iter_chunks_covers_file_in_order(fvecs_file):
    p, X = fvecs_file
    # chunk that does NOT divide n: last block is the remainder
    blocks = list(vecs_iter_chunks(p, chunk_rows=100))
    assert [lo for lo, _ in blocks] == [0, 100, 200]
    assert [len(b) for _, b in blocks] == [100, 100, 57]
    np.testing.assert_array_equal(np.vstack([b for _, b in blocks]), X)


def test_vecs_to_df_chunked_matches_unchunked(spark, fvecs_file):
    p, X = fvecs_file
    whole = {r["id"]: r["vec"] for r in vecs_to_df(spark, p).collect()}
    chunked = {
        r["id"]: r["vec"] for r in vecs_to_df(spark, p, chunk_rows=64).collect()
    }
    assert whole.keys() == chunked.keys() and len(whole) == len(X)
    for i in whole:
        assert whole[i] == pytest.approx(chunked[i])


def test_vecs_to_parquet_streams(spark, fvecs_file, tmp_path):
    p, X = fvecs_file
    dest = str(tmp_path / "vecs_pq")
    n = vecs_to_parquet(spark, p, dest, chunk_rows=90)
    assert n == len(X)
    df = spark.read.parquet(dest)
    assert df.count() == len(X)
    row = df.filter("id = 42").first()
    assert row["vec"] == pytest.approx(X[42].tolist())
