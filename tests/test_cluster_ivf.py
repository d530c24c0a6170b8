"""KMeans + IVF: determinism, assignment exactness, IVF recall
(reference test pattern: tests/test_index_accuracy.py nprobe sweep)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.cluster import KMeans
from faiss_spark.operators.ivf import IVFIndex
from faiss_spark.operators.knn import knn


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


def test_kmeans_deterministic(vectors):
    m1 = KMeans(k=8, niter=10, seed=42).fit(vectors)
    m2 = KMeans(k=8, niter=10, seed=42).fit(vectors)
    assert np.array_equal(m1.centroids, m2.centroids)
    # objective decreases monotonically (Lloyd's invariant)
    assert all(b <= a + 1e-9 for a, b in zip(m1.obj, m1.obj[1:]))


def test_kmeans_assign_is_argmin(vectors, spark):
    model = KMeans(k=8, niter=10, seed=42).fit(vectors)
    assigned = model.assign(vectors).toPandas().set_index("id")
    X = np.stack(vectors.orderBy("id").toPandas()["vec"]).astype(np.float64)
    C = model.centroids
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
    expect = d2.argmin(1)
    got = assigned.sort_index()["cluster"].to_numpy()
    assert np.array_equal(got, expect)


def test_ivf_exact_when_full_probe(vectors):
    """nprobe == nlist must equal brute force (SURVEY §2.B IndexIVF row)."""
    nlist = 8
    idx = IVFIndex.train(vectors, nlist=nlist, seed=42, niter=10).add(vectors)
    queries = vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")
    ivf = idx.search(queries, k=5, nprobe=nlist)
    flat = knn(vectors, queries, 5, metric="l2")
    a = {(r["qid"], r["rank"], r["id"]) for r in ivf.collect()}
    b = {(r["qid"], r["rank"], r["id"]) for r in flat.collect()}
    assert a == b


def test_ivf_recall_improves_with_nprobe(vectors):
    idx = IVFIndex.train(vectors, nlist=16, seed=42, niter=10).add(vectors)
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {
        (r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()
    }

    def recall(nprobe):
        got = {
            (r["qid"], r["id"])
            for r in idx.search(queries, k=10, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r1 <= r4 + 1e-9 <= r16 + 2e-9
    assert r16 == 1.0  # full probe = exact
    assert r4 >= 0.5  # reference-style loose recall floor


def test_ivf_persist_roundtrip(vectors, spark, tmp_path):
    path = str(tmp_path / "ivf_table")
    idx = IVFIndex.train(vectors, nlist=8, seed=42, niter=5).add(
        vectors, path=path
    )
    loaded = IVFIndex.load(spark, path)
    queries = vectors.filter("id < 5").select(F.col("id").alias("qid"), "vec")
    a = {(r["qid"], r["rank"], r["id"]) for r in idx.search(queries, 3, 8).collect()}
    b = {(r["qid"], r["rank"], r["id"]) for r in loaded.search(queries, 3, 8).collect()}
    assert a == b
    # explicit write_index on an in-memory build (save after add)
    path2 = str(tmp_path / "ivf_table2")
    mem = IVFIndex.train(vectors, nlist=8, seed=42, niter=5).add(vectors)
    mem.save(path2)
    c = {
        (r["qid"], r["rank"], r["id"])
        for r in IVFIndex.load(spark, path2).search(queries, 3, 8).collect()
    }
    assert c == a


def test_ivf_search_size_guard_falls_back_to_preassigned(vectors, monkeypatch):
    """A query side over the driver ceiling must route through the
    distributed search_preassigned join plan — and return the same rows
    as the driver-planned path."""
    import faiss_spark.operators.ivf as ivfmod

    idx = IVFIndex.train(vectors, nlist=8, seed=7).add(vectors)
    qs = vectors.filter("id < 16").select(F.col("id").alias("qid"), "vec")
    direct = {
        tuple(r) for r in idx.search(qs, 5, nprobe=8).select("qid", "id", "rank").collect()
    }

    calls = []
    real = ivfmod.search_preassigned

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ivfmod, "search_preassigned", spy)
    # 16 queries × 64 dims = 1024 cells > 64 → guard must trip
    monkeypatch.setattr(ivfmod, "MAX_DRIVER_QUERY_CELLS", 64)
    routed = {
        tuple(r) for r in idx.search(qs, 5, nprobe=8).select("qid", "id", "rank").collect()
    }
    assert calls, "size guard did not route through search_preassigned"
    assert routed == direct


def test_driver_planned_searches_bound_the_query_collect(vectors, monkeypatch):
    """An over-budget query side must never materialize on the driver:
    since r13 EVERY IVF-family search routes to its distributed twin
    past the bound (the pq cogroup here — routing equality pinned in
    test_preassigned_coded.py); the raise-with-guidance contract
    remains for genuinely driver-only paths (flat fast-scan)."""
    import faiss_spark.operators.ivf as ivfmod
    from faiss_spark.operators.ivf import IVFPQIndex

    idx = IVFPQIndex.train(vectors, nlist=4, M=4, seed=1, niter=2, pq_niter=2)
    idx.add(vectors)
    queries = vectors.limit(8).selectExpr("id as qid", "vec")
    monkeypatch.setattr(ivfmod, "MAX_DRIVER_QUERY_CELLS", 64)  # 1 row at d=64
    calls = []
    real = ivfmod.pq_search_preassigned

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ivfmod, "pq_search_preassigned", spy)
    assert idx.search(queries, 3, nprobe=4).count() == 8 * 3
    assert calls, "over-budget IVFPQ search must route to the cogroup twin"
    # the raise path still guards searches WITHOUT a twin: the flat
    # PQ fast-scan is driver-planned only
    from faiss_spark.operators.codecs import ProductQuantizer

    model = ProductQuantizer(M=4, niter=2, seed=1).fit(vectors)
    codes = model.encode(vectors)
    with pytest.raises(ValueError, match="pq_adc_search.*knn_chunked"):
        model.adc_search(codes, queries, 3)
    # within budget: unchanged behavior
    monkeypatch.setattr(ivfmod, "MAX_DRIVER_QUERY_CELLS", 32_000_000)
    assert idx.search(queries, 3, nprobe=4).count() == 8 * 3


def test_miq2_equals_imi_at_full_k2(vectors):
    """MultiIndexQuantizer2 (reference faiss/IndexPQ.h:171): with
    assign_k2 == ksub the per-half truncation is a no-op, so probes are
    bit-equal to plain IMI; truncating k2 shrinks the candidate grid."""
    from faiss_spark.operators.ivf import IMIIVFIndex, MIQ2IVFIndex

    imi = IMIIVFIndex.train(vectors, nbits=3, seed=42, niter=5)
    miq2 = MIQ2IVFIndex.train(vectors, nbits=3, seed=42, niter=5)
    Q = np.stack([np.array(r["vec"]) for r in vectors.limit(8).collect()])
    assert (imi._probe(Q, 12) == miq2._probe(Q, 12)).all()
    # truncated per-half lists: every probed cell must decompose into
    # per-half candidates from the top-k2 of that half
    m3 = MIQ2IVFIndex(sub_centroids=miq2.sub_centroids, assign_k2=3)
    probes = m3._probe(Q, 9)
    assert probes.shape == (8, 9)
    ksub = m3.ksub
    dsub = m3.sub_centroids.shape[2]
    for h in range(2):
        sub = Q[:, h * dsub : (h + 1) * dsub]
        C = m3.sub_centroids[h]
        D = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(2)
        topk2 = np.sort(np.argsort(D, axis=1)[:, :3], axis=1)
        half_ids = probes // ksub if h == 0 else probes % ksub
        for qi in range(len(Q)):
            assert set(half_ids[qi]) <= set(topk2[qi]), (h, qi)


def test_miq2_full_probe_equals_exact(vectors):
    from faiss_spark.operators.ivf import MIQ2IVFIndex

    idx = MIQ2IVFIndex.train(vectors, nbits=2, seed=42, niter=5).add(vectors)
    qs = vectors.filter("id < 5").select(F.col("id").alias("qid"), "vec")
    got = {
        (r["qid"], r["rank"], r["id"])
        for r in idx.search(qs, 5, nprobe=idx.nlist).collect()
    }
    want = {
        (r["qid"], r["rank"], r["id"]) for r in knn(vectors, qs, 5).collect()
    }
    assert got == want


def test_imipq_full_probe_recall_and_factory(vectors):
    """IMI coarse + PQ residual codes (the 'IMI2x<b>,PQ<M>' composite):
    at full probe only PQ quantization error remains — recall vs exact
    well above the nprobe=1 level and monotone; the factory parses the
    classic token and reverse round-trips."""
    from faiss_spark.operators.ivf import IMIPQIndex
    from faiss_spark.plans.factory import index_factory, reverse_index_factory

    idx = IMIPQIndex.train(vectors, nbits=2, M=8, seed=42, niter=5).add(vectors)
    qs = vectors.filter("id < 5").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, qs, 10).collect()}
    full = {
        (r["qid"], r["id"])
        for r in idx.search(qs, 10, nprobe=idx.nlist).collect()
    }
    one = {(r["qid"], r["id"]) for r in idx.search(qs, 10, nprobe=1).collect()}
    r_full = len(full & truth) / len(truth)
    r_one = len(one & truth) / len(truth)
    assert r_full >= 0.5, r_full
    assert r_one <= r_full
    plan = index_factory("IMI2x2,PQ4")
    assert plan.index_type == "imipq" and plan.pq_m == 4
    assert reverse_index_factory(plan) == "IMI2x2,PQ4"
    plan.fit(vectors)
    assert plan.search(qs, 5, nprobe=16).count() == 25


def test_imipq_sift1b_serving_knobs(vectors):
    """The SIFT1B serving row (reference benchs/README.md:122:
    'IMI2x12,PQ16, nprobe=16, max_codes=10000, ht=48') end-to-end on
    IMIPQIndex: loose ht (M·8) is bit-identical to unfiltered, a huge
    max_codes is a no-op, max_codes=1 probes exactly the nearest cell,
    and both knobs compose."""
    from faiss_spark.operators.codecs import PolysemousTraining
    from faiss_spark.operators.ivf import IMIPQIndex

    idx = IMIPQIndex.train(vectors, nbits=2, M=4, seed=42, niter=5)
    idx.pq, _ = PolysemousTraining(n_iter=1000, seed=7).optimize_pq(idx.pq)
    idx.add(vectors)
    idx.codes = idx.codes.localCheckpoint(eager=True)
    qs = vectors.filter("id < 5").select(F.col("id").alias("qid"), "vec")

    def rows(df):
        return sorted((r["qid"], r["rank"], r["id"]) for r in df.collect())

    full = rows(idx.search(qs, 5, nprobe=8))
    assert rows(idx.search(qs, 5, nprobe=8, polysemous_ht=33)) == full
    assert rows(idx.search(qs, 5, nprobe=8, max_codes=10_000_000)) == full
    assert rows(idx.search(qs, 5, nprobe=8, max_codes=1)) == rows(
        idx.search(qs, 5, nprobe=1)
    )
    both = idx.search(qs, 5, nprobe=8, polysemous_ht=6, max_codes=300)
    got = {r["qid"] for r in both.collect()}
    assert got <= set(range(5))  # tight knobs only remove candidates
