"""LSQ, ProductAdditiveQuantizer, ProgressiveDimClustering."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.cluster import progressive_dim_kmeans
from faiss_spark.operators.codecs import (
    LocalSearchQuantizer,
    ProductAdditiveQuantizer,
    ResidualQuantizer,
)


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


def _mse(vectors, model):
    decoded = model.decode(model.encode(vectors))
    a = np.stack(vectors.orderBy("id").toPandas()["vec"]).astype(np.float64)
    b = np.stack(decoded.orderBy("id").toPandas()["vec"]).astype(np.float64)
    return ((a - b) ** 2).mean()


def test_lsq_icm_beats_greedy_rq(vectors):
    """ICM refinement must not be worse than the greedy RQ encoding with
    the same M (the whole point of LSQ)."""
    rq_err = _mse(vectors, ResidualQuantizer(M=4, niter=8, seed=5, beam=1).fit(vectors))
    lsq_err = _mse(
        vectors,
        LocalSearchQuantizer(M=4, train_iters=2, icm_iters=3, niter_init=8, seed=5).fit(vectors),
    )
    assert lsq_err <= rq_err + 1e-12, (lsq_err, rq_err)


def test_paq_roundtrip_and_code_size(vectors):
    paq = ProductAdditiveQuantizer(nsplits=2, M_per_split=2, niter=8).fit(vectors)
    assert paq.code_size() == 4
    X = np.stack(vectors.orderBy("id").toPandas()["vec"]).astype(np.float64)
    codes = paq.encode_np(X)
    assert codes.shape == (len(X), 4)
    Y = paq.decode_np(codes)
    assert Y.shape == X.shape
    assert ((X - Y) ** 2).mean() < (X**2).mean()  # better than zero-decode


def test_progressive_dim_kmeans(vectors):
    m = progressive_dim_kmeans(vectors, k=8, stages=3, seed=42)
    assert m.centroids.shape == (8, 64)
    assigned = m.assign(vectors)
    sizes = assigned.groupBy("cluster").count().collect()
    assert len(sizes) == 8  # all clusters populated
