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
