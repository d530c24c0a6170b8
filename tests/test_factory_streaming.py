"""Factory DSL parse/build/search + streaming incremental add."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.ivf import IVFIndex
from faiss_spark.operators.knn import knn
from faiss_spark.plans.factory import index_factory, reverse_index_factory
from faiss_spark.streaming.incremental import incremental_add_stream


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def queries(vectors):
    return vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")


def test_factory_parse_roundtrip():
    for s in ["Flat", "PCA16,Flat", "IVF64,PQ8", "L2norm,IVF16,Flat",
              "PQ8", "SQ8", "OPQ8,IVF32,PQ8", "Pad80,Flat"]:
        plan = index_factory(s)
        assert reverse_index_factory(plan) == s


def test_factory_rejects_garbage():
    with pytest.raises(ValueError):
        index_factory("HNSW32")  # graph index: deliberately out of scope
    with pytest.raises(ValueError):
        index_factory("PCA16")  # no index stage
    with pytest.raises(ValueError):
        index_factory("IVF16")  # missing code stage


def test_factory_flat_equals_knn(vectors, queries):
    plan = index_factory("Flat").fit(vectors)
    got = {(r["qid"], r["rank"], r["id"]) for r in plan.search(queries, 5).collect()}
    expect = {
        (r["qid"], r["rank"], r["id"]) for r in knn(vectors, queries, 5).collect()
    }
    assert got == expect


def test_factory_pca_ivfflat_end_to_end(vectors, queries):
    plan = index_factory("PCA16,IVF8,Flat").fit(vectors)
    res = plan.search(queries, 5, nprobe=8)
    rows = res.collect()
    from collections import Counter

    assert set(Counter(r["qid"] for r in rows).values()) == {5}
    # the synthetic embeddings are near-isotropic, so PCA 64→16 keeps only
    # ~25% of variance — neighborhood recall is weak by construction; the
    # end-to-end checks that matter: every query finds itself at rank 1
    # (distance-0 in any subspace) and recall is clearly above random
    top1 = {r["qid"]: r["id"] for r in rows if r["rank"] == 1}
    assert all(top1[q] == q for q in top1)
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 5).collect()}
    got = {(r["qid"], r["id"]) for r in rows}
    assert len(got & truth) / len(truth) >= 0.15  # random would be ~0.01


def test_streaming_incremental_add(vectors, spark, tmp_path):
    path = str(tmp_path / "codes")
    ckpt = str(tmp_path / "ckpt")
    stream_dir = str(tmp_path / "incoming")
    import os

    os.makedirs(stream_dir)

    base = vectors.filter("id < 400")
    extra = vectors.filter("id >= 400")
    idx = IVFIndex.train(base, nlist=8, seed=42, niter=5).add(base, path=path)

    # stage new vectors as parquet files, stream them in
    extra.write.mode("overwrite").parquet(stream_dir)
    stream = spark.readStream.schema(extra.schema).parquet(stream_dir)
    q = incremental_add_stream(idx, stream, path=path, checkpoint=ckpt)
    q.awaitTermination(120)

    merged = spark.read.parquet(path)
    idx.codes = merged
    assert merged.count() == vectors.count()
    # a query vector from the appended set now finds itself (exact, full probe)
    probe = vectors.filter("id = 450").select(F.col("id").alias("qid"), "vec")
    top1 = idx.search(probe, k=1, nprobe=8).collect()[0]
    assert top1["id"] == 450 and top1["dist"] == pytest.approx(0.0, abs=1e-9)


def test_factory_ivfsq_ivfrq_rflat_roundtrip(vectors):
    """New grammar arms parse, reverse, and search with high full-probe
    recall (IVFSQ exact-candidate; IVFRQ refined by RFlat is exact@k on
    the surviving candidates)."""
    from faiss_spark.operators.knn import knn
    from faiss_spark.plans.factory import index_factory, reverse_index_factory

    q = vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, q, 5).collect()}

    for desc, min_recall in [("IVF8,SQ8", 0.9), ("IVF8,RQ8,RFlat", 0.9), ("RQ8", 0.8)]:
        plan = index_factory(desc)
        assert reverse_index_factory(plan) == desc
        plan.fit(vectors, seed=42)
        got = {(r["qid"], r["id"]) for r in plan.search(q, 5, nprobe=8).collect()}
        recall = len(got & truth) / len(truth)
        assert recall >= min_recall, (desc, recall)


def test_factory_rejects_bad_refine_position(vectors):
    import pytest as _pytest

    from faiss_spark.plans.factory import index_factory

    with _pytest.raises(ValueError):
        index_factory("RFlat,Flat")  # refinement before index stage
    with _pytest.raises(ValueError):
        index_factory("IVF8,Flat,RFlat,Extra")
