"""Blanket persistence property over the reference's OWN factory corpus
(reference tests/test_io.py over impl/index_write.cpp:1039): every
factory string its tests exercise must fit → write_index → read_index →
search IDENTICALLY. A factory composition that cannot persist must fail
LOUDLY at write time with the class name (sources/state.py pack raises;
sources/persist.py registry raises) — never a silent half-save.

Two test-side adaptations, both cardinality-only (persistence fidelity
is invariant to them; the composition grammar under test is unchanged):
  - outer IVF nlist capped at 32 (training k=65536 k-means on a 300-row
    fixture is meaningless; RCQ/LSQ-coarse forms keep their nlist — it
    is virtual, 2^(M·nbits), and never trains a k-means of that size)
  - coarse-graph degree capped at 8 (R must stay below the capped nlist)

Per-string fixture dimensionality honors the same divisibility
constraints the reference's ProductQuantizer enforces (d % M == 0).
"""

import re

import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.binary import binarize
from faiss_spark.plans.factory import index_binary_factory, index_factory
from faiss_spark.sources.persist import read_index, write_index
from test_factory_parity import (
    BINARY_CORPUS,
    EXPECTED_UNSUPPORTED,
    REFERENCE_CORPUS,
)

# strings whose fixture must not be the default d=64 (PQ sub-space and
# PCA-width divisibility, same arithmetic as the reference)
FIXTURE_D = {
    "IVF1000,PQ25x4fsr": 50,
    "IVF32(PQ25),Flat": 50,
    "IVF32,Flat,Refine(PQ25x12)": 50,
    "IVF50,PQ28x4fs_64": 56,
    "IVF50,PQ28x4fsr_64": 56,
    "PQ28x4fs": 56,
    "PQ28x4fs,RFlat": 56,
    "PQ28x4fs_64": 56,
    "PCAR100,L2Norm,PCAW50,LSHr": 112,
}

# string -> (exception type, match) — compositions that cannot FIT, each
# for a pinned arithmetic/scope reason; the point of listing them is
# that they refuse loudly instead of mis-building
EXPECTED_UNFITTABLE = {
    # 16-bit additive levels are byte-packed here — the standing scope
    # decision test_aq_16bit_levels_fail_loudly pins
    "RQ2x16_3x8_6x4": (NotImplementedError, "1..8 bits per level"),
    # PCA32 outputs d=32; the reference's own ProductQuantizer requires
    # d % M == 0, and 25 does not divide 32 at any input d
    "PCA32,IVF32,Flat,Refine(PQ25x12)": (ValueError, "not divisible"),
}


def _downscale(s: str) -> str:
    def cap_ivf(m):
        if m.group(2):  # IVF<n>(RCQ…/LSQ… — nlist is the VIRTUAL 2^(M·b)
            return m.group(0)
        return f"IVF{min(int(m.group(1)), 32)}"

    s = re.sub(r"IVF(\d+)(\((?:RCQ|LSQ))?", cap_ivf, s)
    s = re.sub(r"_NSG(\d+)", "_NSG8", s)
    s = re.sub(r"_HNSW(\d+)?", "_HNSW8", s)
    return s


@pytest.fixture(scope="module")
def base64(tables):
    # 300-row deterministic slice keeps the 80+ fits affordable
    return (
        tables["embeddings"]
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .filter("vec_id < 300")
    )


def _emb(base, d):
    if d == 64:
        return base
    if d < 64:
        return base.select("id", F.slice("vec", 1, d).alias("vec"))
    return base.select(
        "id", F.concat("vec", F.slice(F.reverse("vec"), 1, d - 64)).alias("vec")
    )


def _rows(df):
    return [
        (r.qid, r.id, round(r.dist, 8))
        for r in df.orderBy("qid", "rank").collect()
    ]


FLOAT_STRINGS = [s for s in REFERENCE_CORPUS if s not in EXPECTED_UNSUPPORTED]


@pytest.mark.parametrize("desc", FLOAT_STRINGS)
def test_corpus_string_persists(desc, base64, tmp_path):
    d = FIXTURE_D.get(desc, 64)
    base = _emb(base64, d)
    if desc in EXPECTED_UNFITTABLE:
        exc, match = EXPECTED_UNFITTABLE[desc]
        with pytest.raises(exc, match=match):
            index_factory(_downscale(desc)).fit(base, seed=42)
        return
    qs = base.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    plan = index_factory(_downscale(desc)).fit(base, seed=42)
    before = _rows(plan.search(qs, 5, nprobe=4))
    write_index(plan, str(tmp_path / "ix"))
    loaded = read_index(base.sparkSession, str(tmp_path / "ix"))
    after = _rows(loaded.search(qs, 5, nprobe=4))
    assert after == before, desc


@pytest.mark.parametrize(
    "desc", [s for s in BINARY_CORPUS if s not in EXPECTED_UNSUPPORTED]
)
def test_binary_corpus_string_persists(desc, base64, tmp_path):
    codes = binarize(base64, 64)
    qcodes = codes.filter("id < 3").select(
        F.col("id").alias("qid"), F.col("code").alias("qcode")
    )
    plan = index_binary_factory(_downscale(desc)).fit(codes, nbits=64, seed=42)
    before = _rows(plan.search(qcodes, 5))
    write_index(plan, str(tmp_path / "bix"))
    loaded = read_index(codes.sparkSession, str(tmp_path / "bix"))
    after = _rows(loaded.search(qcodes, 5))
    assert after == before, desc


def test_unregistered_model_fails_loudly_with_class_name(base64, tmp_path):
    """A fitted plan holding a model class outside the allowlist must
    refuse at write time and NAME the class — the guard that keeps a
    new factory composition from silently half-persisting."""

    class NotAModel:
        pass

    plan = index_factory("Flat").fit(base64, seed=42)
    plan._aq_norm = NotAModel()  # smuggle an unregistered object in
    with pytest.raises(TypeError, match="NotAModel"):
        write_index(plan, str(tmp_path / "bad"))
    # and write_index still refuses non-index objects outright
    with pytest.raises(TypeError, match="NotAModel"):
        write_index(NotAModel(), str(tmp_path / "bad2"))
