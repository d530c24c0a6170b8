"""Generic write_index / read_index round-trips (reference
faiss/index_io.h:38-56): for each persistable index kind, a reloaded
index must search identically to the in-memory one."""

import pytest
from pyspark.sql import functions as F

from faiss_spark.sources.persist import read_index, write_index


@pytest.fixture(scope="module")
def emb(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter("id < 5").select(F.col("id").alias("qid"), "vec")


def _result_rows(df):
    return sorted(
        (r["qid"], r["rank"], r["id"], round(r["dist"], 6))
        for r in df.collect()
    )


def _roundtrip_search_equal(spark, idx, queries, path, k=5, nprobe=4):
    before = _result_rows(idx.search(queries, k, nprobe=nprobe))
    write_index(idx, path)
    reloaded = read_index(spark, path)
    assert type(reloaded) is type(idx)
    after = _result_rows(reloaded.search(queries, k, nprobe=nprobe))
    assert after == before
    return reloaded


def test_ivfpq_write_read_roundtrip(spark, emb, queries, tmp_path):
    from faiss_spark.operators.ivf import IVFPQIndex

    idx = IVFPQIndex.train(emb, nlist=8, M=4).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "ivfpq")
    )
    assert re.pq.codebooks.shape == idx.pq.codebooks.shape


def test_ivfsq_write_read_roundtrip(spark, emb, queries, tmp_path):
    from faiss_spark.operators.ivf import IVFSQIndex

    idx = IVFSQIndex.train(emb, nlist=8, bits=8).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "ivfsq")
    )
    assert re.sq.bits == 8 and re.metric == idx.metric


def test_ivfaq_write_read_roundtrip(spark, emb, queries, tmp_path):
    from faiss_spark.operators.ivf import IVFAQIndex

    idx = IVFAQIndex.train(emb, nlist=8, M=4).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "ivfaq")
    )
    assert re.rq.beam == idx.rq.beam


def test_ivfaq_rcq_coarse_write_read_roundtrip(spark, emb, queries, tmp_path):
    """IVF(RCQ),RQ coded lists: the reloaded index must carry the coarse
    codebooks (not materialized centroids) and search identically."""
    from faiss_spark.operators.codecs import ResidualCoarseQuantizer
    from faiss_spark.operators.ivf import IVFAQIndex

    cq = ResidualCoarseQuantizer(M=2, nbits=3, seed=7).fit(emb)
    idx = IVFAQIndex.train(emb, nlist=64, M=3, nbits=4, coarse_q=cq).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "ivfaq_rcq")
    )
    assert re.centroids is None and re.coarse_q.nlist == 64


def test_ivfsq_rcq_coarse_write_read_roundtrip(spark, emb, queries, tmp_path):
    from faiss_spark.operators.codecs import ResidualCoarseQuantizer
    from faiss_spark.operators.ivf import IVFSQIndex

    cq = ResidualCoarseQuantizer(M=2, nbits=3, seed=7).fit(emb)
    idx = IVFSQIndex.train(emb, nlist=64, bits=8, coarse_q=cq).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "ivfsq_rcq")
    )
    assert re.centroids is None and re.coarse_q.nlist == 64


def test_ivfnested_enum_router_write_read_roundtrip(spark, emb, queries, tmp_path):
    """IVF<n>(PQ<M>),Flat — the enum (ADC-routed) nested coarse router
    must round-trip through npy/json artifacts and search identically."""
    from faiss_spark.operators.ivf import IVFNestedIndex

    idx = IVFNestedIndex.train(emb, nlist=8, sub=("pq", 8, 4), seed=7).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "ivfnested_pq")
    )
    assert re.router.kind == "pq" and re.router.centroids is None


def test_ivfnested_composite_router_write_read_roundtrip(
    spark, emb, queries, tmp_path
):
    """The recursive composite router (IVF<n>(IVF<m>,SQ4,Refine(SQ8)))
    round-trips: inner cells, both SQ codecs' codes/ranges, k_factor."""
    from faiss_spark.operators.ivf import CompositeCoarseRouter, IVFNestedIndex

    sub = (
        "composite",
        {"inner_k": 2, "codec": ("sq", 4), "refine": ("sq", 8)},
    )
    idx = IVFNestedIndex.train(emb, nlist=8, sub=sub, seed=7).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "ivfnested_comp")
    )
    assert isinstance(re.router, CompositeCoarseRouter)
    assert re.router.codec_kind == "sq" and re.router.refine_kind == "sq"
    assert re.router.sq_model.bits == 4 and re.router.ref_sq_model.bits == 8


def test_ivfpqr_codes_mode_survives_reload(spark, emb, queries, tmp_path):
    """The PQR deployment story: save drops the raw table; the reloaded
    index auto-selects rerank='pqr_codes' and returns the same ranking
    the in-memory codes-mode search returns."""
    from faiss_spark.operators.ivf import IVFPQRIndex

    idx = IVFPQRIndex.train(emb, nlist=8, M=4, M_refine=4, k_factor=4)
    before = _result_rows(
        idx.search(queries, 5, nprobe=4, rerank="pqr_codes")
    )
    write_index(idx, str(tmp_path / "ivfpqr"))
    re = read_index(spark, str(tmp_path / "ivfpqr"))
    assert re.vectors is None  # raw table deliberately not persisted
    assert re.k_factor == idx.k_factor
    after = _result_rows(re.search(queries, 5, nprobe=4))  # auto mode
    assert after == before


def test_binary_ivf_write_read_roundtrip(spark, tables, tmp_path):
    from faiss_spark.operators.binary import BinaryIVFIndex, binarize

    emb = tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    codes = binarize(emb, d=64)
    idx = BinaryIVFIndex.train(codes, nlist=4, nbits=64).add(codes)
    q = codes.filter("id < 5").select(
        F.col("id").alias("qid"), F.col("code").alias("qcode")
    )
    before = _result_rows(idx.search(q, 5, nprobe=2))
    write_index(idx, str(tmp_path / "bivf"))
    re = read_index(spark, str(tmp_path / "bivf"))
    assert re.nbits == idx.nbits
    assert _result_rows(re.search(q, 5, nprobe=2)) == before


def test_nsg_meta_round_trips_R_and_nshards(spark, emb, queries, tmp_path):
    from faiss_spark.operators.nsg import NSGIndex

    idx = NSGIndex.build(emb, R=12, knn_k=16, nshards=4)
    write_index(idx, str(tmp_path / "nsg"))
    re = read_index(spark, str(tmp_path / "nsg"))
    assert (re.R, re.nshards) == (12, idx.nshards)
    got = re.search(queries, 5, search_L=32)
    assert got.count() == 25


def test_write_index_rejects_unknown_and_missing_marker(spark, tmp_path):
    with pytest.raises(TypeError, match="not a persistable index"):
        write_index(object(), str(tmp_path / "nope"))
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError, match="_index_kind.json"):
        read_index(spark, str(tmp_path / "empty"))


def test_ivfpq_fastscan_roundtrip_both_modes(spark, emb, queries, tmp_path):
    from faiss_spark.operators.fastscan import IVFPQFastScanIndex

    for mode in (True, False):
        idx = IVFPQFastScanIndex.train(
            emb, nlist=8, M=16, by_residual=mode
        ).add(emb)
        re = _roundtrip_search_equal(
            spark, idx, queries, str(tmp_path / f"pqfs_{mode}")
        )
        assert re.by_residual is mode


def test_ivfaq_fastscan_roundtrip(spark, emb, queries, tmp_path):
    from faiss_spark.operators.fastscan import IVFAQFastScanIndex

    idx = IVFAQFastScanIndex.train(emb, nlist=8, M=16).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "aqfs")
    )
    assert re.norm_scale == idx.norm_scale and re.by_residual is True


def test_ivf_paq_fastscan_roundtrip(spark, emb, queries, tmp_path):
    """PRQ fast-scan save/load: the paq meta stamp must rebuild the
    PER-SPLIT adapter (not a flat RQ over the padded codebooks), so both
    search AND post-reload encode reproduce the original."""
    import numpy as np

    from faiss_spark.operators.fastscan import (
        ProductAQAdapter,
        train_ivf_paq_fastscan,
    )

    idx = train_ivf_paq_fastscan(
        emb, nlist=8, nsplits=4, Msub=4, by_residual=False
    ).add(emb)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "paqfs")
    )
    assert isinstance(re.rq, ProductAQAdapter)
    assert re.by_residual is False
    assert len(re.rq.paq.subs) == 4 and re.rq.paq.subs[0].M == 4
    # per-split encode survives the round-trip bit-for-bit
    X = np.stack(
        [np.asarray(v, np.float64) for v in emb.limit(64).toPandas()["vec"]]
    )
    assert np.array_equal(idx.rq.encode_np(X), re.rq.encode_np(X))


def test_imipq_write_read_roundtrip(spark, emb, queries, tmp_path):
    from faiss_spark.operators.ivf import IMIPQIndex

    idx = IMIPQIndex.train(emb, nbits=2, M=4, niter=5).add(emb)
    idx.codes = idx.codes.localCheckpoint(eager=True)
    re = _roundtrip_search_equal(
        spark, idx, queries, str(tmp_path / "imipq")
    )
    assert re.sub_centroids.shape == idx.sub_centroids.shape
