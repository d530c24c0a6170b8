"""ResidualQuantizer: roundtrip monotonicity + beam behavior
(reference tests/test_residual_quantizer.py patterns)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.codecs import ResidualQuantizer, ScalarQuantizer


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


def test_rq_more_levels_less_error(vectors):
    e2 = _mse(vectors, ResidualQuantizer(M=2, niter=8, seed=5).fit(vectors))
    e4 = _mse(vectors, ResidualQuantizer(M=4, niter=8, seed=5).fit(vectors))
    assert e4 < e2


def test_rq_beam_no_worse_than_greedy(vectors):
    rq = ResidualQuantizer(M=4, niter=8, seed=5, beam=1).fit(vectors)
    greedy = _mse(vectors, rq)
    rq.beam = 4
    beam = _mse(vectors, rq)
    assert beam <= greedy + 1e-12


def test_rq_code_size_and_determinism(vectors):
    rq = ResidualQuantizer(M=4, niter=5, seed=5).fit(vectors)
    assert rq.code_size() == 4
    a = {r["id"]: bytes(r["code"]) for r in rq.encode(vectors).collect()}
    b = {r["id"]: bytes(r["code"]) for r in rq.encode(vectors).collect()}
    assert a == b
