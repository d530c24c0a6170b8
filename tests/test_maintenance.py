"""Thin maintenance verbs, MatrixStats, two-level clustering, autotune."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.ivf import IVFIndex
from faiss_spark.operators.knn import knn
from faiss_spark.operators.maintenance import (
    matrix_stats,
    merge_from,
    parameter_sweep,
    reconstruct_batch,
    remove_ids,
    two_level_clustering,
)


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


def test_remove_then_search_excludes(vectors):
    idx = IVFIndex.train(vectors, nlist=8, seed=42, niter=5).add(vectors)
    remove_ids(idx, F.col("id") < 100)
    q = vectors.filter("id = 50").select(F.col("id").alias("qid"), "vec")
    res = idx.search(q, k=5, nprobe=8).collect()
    assert all(r["id"] >= 100 for r in res)


def test_merge_equals_monolithic(vectors):
    """merged shards == monolithic index (reference test_merge_index.py)."""
    idx = IVFIndex.train(vectors, nlist=8, seed=42, niter=5)
    a = IVFIndex(centroids=idx.centroids, metric="l2").add(vectors.filter("id < 250"))
    b = IVFIndex(centroids=idx.centroids, metric="l2").add(vectors.filter("id >= 250"))
    merge_from(a, b)
    mono = IVFIndex(centroids=idx.centroids, metric="l2").add(vectors)
    q = vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")
    ra = {(r["qid"], r["rank"], r["id"]) for r in a.search(q, 5, nprobe=8).collect()}
    rm = {(r["qid"], r["rank"], r["id"]) for r in mono.search(q, 5, nprobe=8).collect()}
    assert ra == rm


def test_merge_incompatible_rejected(vectors):
    a = IVFIndex.train(vectors, nlist=8, seed=42, niter=5).add(vectors)
    b = IVFIndex.train(vectors, nlist=8, seed=99, niter=5).add(vectors)
    with pytest.raises(ValueError):
        merge_from(a, b)


def test_merge_rejects_mismatched_additive_coarse(vectors):
    """r11 review catch: centroids is None under an additive coarse and
    np.array_equal(None, None) is vacuously True — two IVFAQ indexes
    with DIFFERENT RCQ codebooks must refuse, not silently union
    incompatible virtual list_no spaces; same-codebook merge works."""
    from faiss_spark.operators.codecs import ResidualCoarseQuantizer
    from faiss_spark.operators.ivf import IVFAQIndex

    cq1 = ResidualCoarseQuantizer(M=2, nbits=2, seed=1).fit(vectors)
    cq2 = ResidualCoarseQuantizer(M=2, nbits=2, seed=2).fit(vectors)
    a = IVFAQIndex.train(vectors, nlist=16, M=2, coarse_q=cq1).add(vectors)
    b = IVFAQIndex.train(vectors, nlist=16, M=2, coarse_q=cq2).add(vectors)
    with pytest.raises(ValueError, match="coarse"):
        merge_from(a, b)
    # k-means vs additive is also incompatible
    km = IVFIndex.train(vectors, nlist=16, seed=42, niter=5).add(vectors)
    with pytest.raises(ValueError, match="coarse"):
        merge_from(km, a)
    # same fitted coarse merges fine
    c = IVFAQIndex(
        centroids=None, rq=a.rq, metric="l2", coarse_q=cq1
    ).add(vectors.filter("id < 100"))
    merge_from(a, c)


def test_reconstruct_roundtrip(vectors):
    idx = IVFIndex.train(vectors, nlist=8, seed=42, niter=5).add(vectors)
    got = {r["id"]: r["vec"] for r in reconstruct_batch(idx, [3, 7, 11]).collect()}
    orig = {r["id"]: r["vec"] for r in vectors.filter("id in (3,7,11)").collect()}
    assert got.keys() == orig.keys()
    for i in got:
        assert got[i] == orig[i]


def test_matrix_stats_matches_numpy(vectors):
    stats = matrix_stats(vectors).collect()
    X = np.stack(vectors.orderBy("id").toPandas()["vec"]).astype(np.float64)
    assert len(stats) == X.shape[1]
    for r in stats:
        p = r["pos"]
        assert r["mean"] == pytest.approx(X[:, p].mean(), rel=1e-9)
        assert r["std"] == pytest.approx(X[:, p].std(), rel=1e-6)
        assert r["min"] == pytest.approx(X[:, p].min())
        assert r["max"] == pytest.approx(X[:, p].max())


def test_two_level_clustering(vectors):
    C, assigned = two_level_clustering(vectors, k1=4, k2=4, niter=5)
    assert C.shape == (16, 64)
    rows = assigned.collect()
    assert len(rows) == vectors.count()
    assert all(0 <= r["cluster"] < 16 for r in rows)


def test_parameter_sweep_pareto(vectors):
    idx = IVFIndex.train(vectors, nlist=16, seed=42, niter=5).add(vectors)
    q = vectors.filter("id < 20").select(F.col("id").alias("qid"), "vec")
    truth = knn(vectors, q, 10)
    pts = parameter_sweep(idx, q, truth, k=10, nprobes=[1, 4, 16])
    by_np = {p.params["nprobe"]: p for p in pts}
    assert by_np[16].recall == pytest.approx(1.0)
    assert by_np[1].recall <= by_np[4].recall + 1e-9 <= by_np[16].recall + 2e-9
    assert any(p.pareto for p in pts)
    # max-recall point is always on the frontier
    assert max(pts, key=lambda p: (p.recall, -p.time_sec)).pareto


def test_inspect_tools(vectors, spark):
    """contrib/inspect_tools surface over the table layout: invlist
    content, sizes (sum == n), PQ centroids, info string."""
    from faiss_spark.functions.inspect import (
        get_invlist,
        get_invlist_sizes,
        get_pq_centroids,
        print_index_info,
    )
    from faiss_spark.operators.codecs import ProductQuantizer
    from faiss_spark.operators.ivf import IVFIndex

    idx = IVFIndex.train(vectors, nlist=4, seed=42, niter=5).add(vectors)
    sizes = get_invlist_sizes(idx)
    assert sizes.shape == (4,) and sizes.sum() == vectors.count()
    busiest = int(sizes.argmax())
    ids, payload = get_invlist(idx, busiest)
    assert len(ids) == sizes[busiest] and len(payload) == len(ids)
    assert sorted(ids) == list(ids)  # ordered by id

    pqm = ProductQuantizer(M=4, seed=42).fit(vectors)
    cent = get_pq_centroids(pqm)
    assert cent.shape[0] == 4 and cent.ndim == 3

    info = print_index_info(idx)
    assert "IVFIndex" in info and "centroids" in info
