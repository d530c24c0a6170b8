"""kmeans1d, weighted kmeans, rowwise minmax, split-vectors knn,
adaptive range search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.cluster import KMeans, kmeans_1d
from faiss_spark.operators.knn import (
    knn,
    range_search_max_results,
    split_vectors_knn,
)
from faiss_spark.operators.transforms import rowwise_minmax_expr


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def queries(vectors):
    return vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")


def test_kmeans_1d_exact_on_obvious_clusters():
    x = np.array([0.0, 0.1, 0.2, 10.0, 10.1, 10.2, 20.0, 20.1])
    C = kmeans_1d(x, 3)
    assert np.allclose(sorted(C), [0.1, 10.1, 20.05])


def test_kmeans_1d_optimal_vs_brute():
    rng = np.random.default_rng(3)
    x = rng.normal(size=30)
    C = kmeans_1d(x, 4)
    # DP cost must beat 50 seeded Lloyd restarts (it is exactly optimal)
    def cost(cent):
        d = np.abs(x[:, None] - np.asarray(cent)[None, :]).min(1)
        return (d**2).sum()

    dp_cost = cost(C)
    for s in range(50):
        r = np.random.default_rng(s)
        c0 = x[r.permutation(len(x))[:4]]
        for _ in range(30):
            lab = np.abs(x[:, None] - c0[None, :]).argmin(1)
            c0 = np.array([x[lab == i].mean() if (lab == i).any() else c0[i] for i in range(4)])
        assert dp_cost <= cost(c0) + 1e-9


def test_weighted_kmeans_pulls_centroids(spark):
    rows = [(i, [0.0, 0.0], 100.0) for i in range(5)] + [
        (i + 5, [10.0, 10.0], 0.01) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "id bigint, vec array<float>, w double")
    m = KMeans(k=1, niter=10, seed=1).fit(df, weight_col="w")
    # heavily-weighted points dominate the single centroid
    assert np.allclose(m.centroids[0], [0.0, 0.0], atol=0.1)


def test_rowwise_minmax(spark):
    df = spark.createDataFrame([([2.0, 4.0, 6.0],)], "vec array<float>")
    r = df.select(rowwise_minmax_expr(F.col("vec")).alias("s")).first()["s"]
    assert r["vmin"] == 2.0 and r["vrange"] == 4.0
    assert r["scaled"] == [0.0, 0.5, 1.0]


def test_split_vectors_equals_full_knn(vectors, queries):
    got = split_vectors_knn(vectors, queries, 5, splits=[(1, 32), (33, 32)])
    expect = knn(vectors, queries, 5)
    a = {(r["qid"], r["rank"], r["id"]) for r in got.collect()}
    b = {(r["qid"], r["rank"], r["id"]) for r in expect.collect()}
    assert a == b


def test_range_search_max_results_shrinks(vectors, queries):
    res, radius = range_search_max_results(
        vectors, queries, max_results=50, initial_radius=10.0
    )
    assert res.count() <= 50
    assert radius < 10.0


def test_knn_chunked_equals_knn(vectors):
    from faiss_spark.operators.knn import knn_chunked

    qs = vectors.filter("id < 60").select(F.col("id").alias("qid"), "vec")
    a = {
        (r["qid"], r["rank"], r["id"])
        for r in knn_chunked(vectors, qs, 5, chunk_size=17).collect()
    }
    b = {(r["qid"], r["rank"], r["id"]) for r in knn(vectors, qs, 5).collect()}
    assert a == b


def test_bpe_token_count(spark):
    from faiss_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [("I don't have 42 apples, okay?!",), ("",)], "text string"
    )
    got = [r[0] for r in df.select(bpe_token_count(F.col("text"))).collect()]
    # 'I', ' don', "'t", ' have', ' 42', ' apples', ',', ' okay', '?!'
    assert got == [9, 0]
