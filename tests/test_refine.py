"""IndexRefine re-rank, IndexFlat1D, IndexIVFFlatDedup semantics."""

import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.ivf import IVFPQIndex
from faiss_spark.operators.knn import knn
from faiss_spark.operators.refine import (
    dedup_flat,
    dedup_flat_search,
    knn_1d,
    refine_search,
)


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def queries(vectors):
    return vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")


def test_refine_improves_ivfpq(vectors, queries):
    """ANN candidates + exact re-rank ≥ raw ANN quality, and the refined
    ranking equals exact ranking ON the candidate set (IndexRefine)."""
    idx = IVFPQIndex.train(vectors, nlist=8, M=8, seed=42, niter=5, pq_niter=5).add(vectors)
    k, kf = 5, 4
    cands = idx.search(queries, k * kf, nprobe=8)
    refined = refine_search(cands, vectors, queries, k)
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, k).collect()}
    raw = {(r["qid"], r["id"]) for r in idx.search(queries, k, nprobe=8).collect()}
    ref = {(r["qid"], r["id"]) for r in refined.collect()}
    assert len(ref & truth) >= len(raw & truth)
    # distances in the refined result are TRUE distances (not ADC approx)
    flat = {
        (r["qid"], r["id"]): r["dist"] for r in knn(vectors, queries, 500).collect()
    }
    for r in refined.collect():
        assert r["dist"] == pytest.approx(flat[(r["qid"], r["id"])], rel=1e-9)


def test_refine_through_transform_chain(vectors, queries):
    """Refine over a transform+index CHAIN (reference
    'RQ2x5,Refine(ITQ,LSHt)', tests/test_standalone_codec.py:341,386):
    the refine reconstructions must equal the decode of the STORED LSH
    codes — ±1 bits + trained thresholds (IndexLSH::sa_decode,
    IndexLSH.cpp:153-178) — brought back through the ITQ chain's reverse
    transform, and the refined top-k must equal a numpy re-rank of the
    base plan's k·k_factor candidate pool under those reconstructions."""
    import numpy as np

    from faiss_spark.plans.factory import index_factory

    plan = index_factory("RQ2x5,Refine(ITQ,LSHt)").fit(vectors, seed=42)
    res = plan.search(queries, 5).toPandas().sort_values(["qid", "rank"])
    sub = plan._refine_plan
    itq = sub.pipeline.models[0]
    lsh = sub.index

    cp = lsh.codes.toPandas().sort_values("id")
    W = np.stack(cp["code"].to_numpy()).astype(np.int64)
    bits = ((W[:, :, None] >> np.arange(64, dtype=np.int64)) & 1).reshape(
        len(W), -1
    )[:, : lsh.nbits]
    Xh = (2.0 * bits - 1.0 + lsh.thresholds) @ itq.A  # reverse chain
    tbl = plan._refine_table.toPandas().sort_values("id")
    ids = tbl["id"].to_numpy()
    assert (ids == cp["id"].to_numpy()).all()
    got = np.stack(tbl["vec"].to_numpy()).astype(np.float64)
    assert np.allclose(got, Xh, atol=1e-4)

    # the refined result is exactly the re-rank of the base pool
    base = index_factory("RQ2x5").fit(vectors, seed=42)
    pool = base.search(queries, 5 * plan.k_factor).toPandas()
    qp = queries.toPandas()
    Q = np.stack(qp["vec"].to_numpy()).astype(np.float64)
    id2row = {i: r for r, i in enumerate(ids)}
    for qi, qid in enumerate(qp["qid"]):
        cand = pool[pool.qid == qid]["id"].to_numpy()
        d2 = np.array(
            [((Xh[id2row[c]] - Q[qi]) ** 2).sum() for c in cand]
        )
        order = np.lexsort((cand, d2))[:5]
        gotq = res[res.qid == qid]["id"].to_numpy()
        assert (cand[order] == gotq).all()


def test_refine_chain_variants_build_and_refuse(vectors, queries):
    """'RQ1x4,Refine(ITQ16,LSH)' (the reference's other chain spelling)
    searches; non-reversible transforms inside Refine refuse at parse."""
    from faiss_spark.plans.factory import index_factory

    plan = index_factory("RQ1x4,Refine(ITQ16,LSH)").fit(vectors, seed=42)
    assert plan.search(queries, 5).count() == queries.count() * 5
    with pytest.raises(ValueError, match="orthonormal-reversible"):
        index_factory("RQ2x3,Refine(PCA8,SQ8)")
    with pytest.raises(ValueError, match="not reversible"):
        index_factory("RQ2x3,Refine(L2norm,SQ8)")


def test_knn_1d_matches_oracle(tables, oracle):
    from tests.conftest import duck_set, rows_set

    li = tables["part"]
    vals = li.select(F.col("p_partkey").alias("id"), F.col("p_retailprice").alias("x"))
    qs = vals.filter("id <= 5").select(F.col("id").alias("qid"), F.col("x").alias("qx"))
    got = knn_1d(vals, qs, 3).withColumn("dist", F.round("dist", 6))
    expect = duck_set(
        oracle,
        """
        WITH q AS (SELECT p_partkey AS qid, p_retailprice AS qx FROM part WHERE p_partkey <= 5),
        d AS (SELECT q.qid, p.p_partkey AS id, abs(p.p_retailprice - q.qx) AS dist
              FROM q CROSS JOIN part p),
        r AS (SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
        SELECT qid, id, round(dist, 6) AS dist, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3
        """,
    )
    assert rows_set(got) == expect


def test_dedup_flat_roundtrip(vectors, queries, spark):
    # plant duplicate vectors under new ids
    dup = vectors.filter("id < 5").withColumn("id", F.col("id") + 10_000)
    both = vectors.unionByName(dup)
    table = dedup_flat(both)
    assert table.count() == vectors.count()  # 5 dups collapsed
    planted = {r["rep_id"]: r for r in table.filter(F.col("n_dup") >= 2).collect()}
    assert set(planted) == {0, 1, 2, 3, 4}
    assert planted[3]["ids"] == [3, 10_003]

    # search returns BOTH ids of a duplicated vector at the same dist
    res = dedup_flat_search(table, queries, 3).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["qid"], set()).add(r["id"])
    for q in range(5):
        assert {q, q + 10_000} <= by_q[q]
