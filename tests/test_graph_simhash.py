"""NN-Descent knn-graph recall + SimHash dedup."""

import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.dedup import simhash_expr, simhash_neardup_pairs
from faiss_spark.operators.graph import knn_graph_recall, nn_descent
from faiss_spark.operators.knn import knn_join


@pytest.fixture(scope="module")
def vectors(tables):
    # keep the graph small: NN-Descent does several self-joins per iter
    return (
        tables["embeddings"]
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .filter("id < 200")
    )


def test_nn_descent_recall_improves(vectors):
    exact = knn_join(vectors, 10, "l2")
    g1 = nn_descent(vectors, k=10, niter=1)
    g3 = nn_descent(vectors, k=10, niter=3)
    r1 = knn_graph_recall(g1, exact, 10)
    r3 = knn_graph_recall(g3, exact, 10)
    assert r3 >= r1 - 1e-9
    assert r3 >= 0.85, (r1, r3)


def test_nn_descent_no_self_edges_and_k_per_node(vectors):
    g = nn_descent(vectors, k=5, niter=1)
    rows = g.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    from collections import Counter

    counts = Counter(r["src"] for r in rows)
    assert set(counts.values()) == {5}


def test_simhash_identical_docs_zero_hamming(tables, spark):
    base = tables["documents"].limit(50)
    planted = base.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    pairs = simhash_neardup_pairs(base.unionByName(planted)).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for i in range(5):
        assert found.get((i, i + 1_000_000)) == 0


def test_simhash_deterministic(tables):
    docs = tables["documents"].limit(100)
    a = docs.select("doc_id", simhash_expr(F.col("text")).alias("sh")).collect()
    b = docs.select("doc_id", simhash_expr(F.col("text")).alias("sh")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # 32-bit range
    assert all(0 <= r["sh"] < (1 << 32) for r in a)


def test_simhash64_identical_docs_zero_hamming(tables, spark):
    from faiss_spark.operators.dedup import simhash64_neardup_pairs

    base = tables["documents"].limit(50)
    planted = base.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    pairs = simhash64_neardup_pairs(base.unionByName(planted)).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for i in range(5):
        assert found.get((i, i + 1_000_000)) == 0


def test_simhash64_words_are_32bit_and_stricter_than_32(tables):
    """Each word stays in the double-exact 32-bit range, and the 64-bit
    fingerprint (same threshold) accepts a subset of the 32-bit pairs —
    doubling the bits can only make hamming ≤ t harder to satisfy."""
    from faiss_spark.operators.dedup import simhash64_neardup_pairs

    docs = tables["documents"].limit(200)
    sig = docs.select(
        simhash_expr(F.col("text"), hex_offset=0).alias("lo"),
        simhash_expr(F.col("text"), hex_offset=8).alias("hi"),
    ).collect()
    assert all(0 <= r["lo"] < (1 << 32) and 0 <= r["hi"] < (1 << 32) for r in sig)
    p32 = {(r["id_a"], r["id_b"]) for r in simhash_neardup_pairs(docs).collect()}
    p64 = {(r["id_a"], r["id_b"]) for r in simhash64_neardup_pairs(docs).collect()}
    assert p64 <= p32


def test_knn_graph_bucketed_recall(vectors):
    """IVF-cell graph must recover most exact edges at modest nprobe,
    every node gets edges, and no self-edges survive."""
    from faiss_spark.operators.graph import knn_graph_bucketed
    from faiss_spark.operators.knn import knn_join

    exact = {(r["qid"], r["id"]) for r in knn_join(vectors, 5, "l2").collect()}
    got_rows = knn_graph_bucketed(vectors, 5, nlist=8, nprobe=3, seed=42).collect()
    got = {(r["src"], r["dst"]) for r in got_rows}
    assert all(r["src"] != r["dst"] for r in got_rows)
    n_nodes = vectors.count()
    assert len({r["src"] for r in got_rows}) == n_nodes
    recall = len(got & exact) / len(exact)
    assert recall >= 0.7, recall
