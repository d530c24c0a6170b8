"""IVFPQ composite: ADC-vs-decoded consistency and recall-vs-exact
(reference recall pattern: tests/test_index_accuracy.py)."""

import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.ivf import IVFPQIndex
from faiss_spark.operators.knn import knn


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def index(vectors):
    return IVFPQIndex.train(
        vectors, nlist=8, M=8, seed=42, niter=10, pq_niter=8
    ).add(vectors)


def test_ivfpq_full_probe_recall(vectors, index):
    """Full probe: candidate set is everything, so only PQ quantization
    error hurts — recall@10 vs exact should be high on 64d data."""
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}
    got = {
        (r["qid"], r["id"])
        for r in index.search(queries, k=10, nprobe=8).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, recall


def test_ivfpq_nprobe_monotone(vectors, index):
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}

    def recall(nprobe):
        got = {
            (r["qid"], r["id"])
            for r in index.search(queries, k=10, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    assert recall(1) <= recall(4) + 1e-9 <= recall(8) + 2e-9


def test_ivfpq_each_query_gets_k(vectors, index):
    queries = vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")
    rows = index.search(queries, k=5, nprobe=8).collect()
    from collections import Counter

    counts = Counter(r["qid"] for r in rows)
    assert set(counts.values()) == {5}
    assert all(r["dist"] >= 0 for r in rows)
