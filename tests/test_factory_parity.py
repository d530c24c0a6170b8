"""Factory-grammar parity against the reference's OWN test corpus.

The string list below is every factory description that appears in the
reference's tests/ and benchs/ (collected mechanically in round 10).
A reference user's factory strings should parse here; the ones that
can't are pinned in EXPECTED_UNSUPPORTED with the reason, so a future
regression in either direction (a supported string breaking, or an
unsupported one silently "passing" into wrong semantics) fails loudly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.plans.factory import (
    index_binary_factory,
    index_factory,
    reverse_index_factory,
)

# every factory string found in the reference's tests/ + benchs/
REFERENCE_CORPUS = [
    "Flat", "Flat,IDMap", "Flat,IDMap2", "Flat,RFlat", "IDMap,IVF32,Flat",
    "IDMap2,Flat", "IMI2x5,PQ8np", "ITQ,LSHt", "ITQ8,LSHt", "IVF1,PQ16x4np",
    "IVF10,FlatDedup", "IVF10,PQ4", "IVF10,PQ4np", "IVF10,SQ8",
    "IVF100(LSHr),Flat", "IVF100,LSQ4x4_Nqint8",
    "IVF1000(IVF20,SQ4,Refine(SQ8)),Flat", "IVF1000,PQ25x4fsr",
    "IVF100_HNSW,Flat", "IVF1024(RCQ2x5),Flat", "IVF1024(RCQ2x5),SQ8",
    "IVF1024,LSQ5x6_Ncqint8", "IVF1024,LSQ5x6_Nqint8",
    "IVF1024,RQ8x8_Ncqint4", "IVF1024,RQ8x8_Ncqint8", "IVF1024,RQ8x8_Nfloat",
    "IVF16384,Flat", "IVF2,Flat", "IVF20,SQ8", "IVF256(RCQ2x4),RQ3x4",
    "IVF256,ITQ64,SH1.2", "IVF32(PQ25),Flat", "IVF32,Flat",
    "IVF32,Flat,Refine(PQ25x12)", "IVF32,PQ16np", "IVF32,PQ16x4np",
    "IVF32,SQ8,RFlat", "IVF32_HNSW32,SQ8", "IVF4096,PQ64", "IVF456,Flat",
    "IVF5,Flat", "IVF50,PQ16np", "IVF50,PQ28x4fs_64", "IVF50,PQ28x4fsr_64",
    "IVF64(RCQ2x3),Flat", "IVF64,Flat", "IVF64,SQ8", "IVF65536_NSG64,Flat",
    "IVF65536_NSG64,PQ2x8", "L2norm,PCA2,L2norm,Flat",
    "L2norm,PCA8,IVF32,PQ8np", "LSHrt,Refine(Flat)", "LSQ5x6_Ncqint4",
    "LSQ5x6_Ncqint8", "LSQ5x6_Nqint8", "NSG64", "NSG64,Flat", "OPQ16,Flat",
    "OPQ16_64,Flat", "PCA16,Flat", "PCA16,IVF100,SQ8",
    "PCA30,IVF32(PQ15),Flat", "PCA32,IVF32,Flat,Refine(PQ25x12)",
    "PCAR100,L2Norm,PCAW50,LSHr", "PCAR32,IVF32,SQ8,RFlat", "PCAR8,IVF10,PQ4",
    "PCAW60,Flat", "PQ16x4np", "PQ28x4fs", "PQ28x4fs,RFlat", "PQ28x4fs_64",
    "PQ4", "PQ4np", "PQ4x4np", "RCQ1x3_1x4_1x5", "RQ1x4,Refine(ITQ16,LSH)",
    "RQ20x8", "RQ2x16_3x8_6x4", "RQ2x3,Refine(Flat)",
    "RQ2x5,Refine(ITQ,LSHt)", "RQ8x8_Nqint8", "SQ8", "HNSW32,Flat", "HNSW32",
    "HNSW32,SQ8",
]
BINARY_CORPUS = [
    "BFlat", "BHNSW32", "BHash12", "BHash5x6", "BIVF10", "BIVF1024_BHNSW32",
    "BIVF200",
]

# string -> reason it does not parse (each a documented scope decision)
EXPECTED_UNSUPPORTED = {
    # HNSW as an online insertion structure is out of scope (COVERAGE.md);
    # the batch capability is NSG / NN-Descent
    "HNSW32,Flat": "HNSW oos", "HNSW32": "HNSW oos", "HNSW32,SQ8": "HNSW oos",
    "BHNSW32": "HNSW oos",
}


def test_reference_corpus_parses():
    failed = {}
    for s in REFERENCE_CORPUS:
        try:
            index_factory(s)
        except Exception as ex:
            failed[s] = str(ex)
    for s in BINARY_CORPUS:
        try:
            index_binary_factory(s)
        except Exception as ex:
            failed[s] = str(ex)
    unexpected = {s: e for s, e in failed.items() if s not in EXPECTED_UNSUPPORTED}
    silently_ok = [s for s in EXPECTED_UNSUPPORTED if s not in failed]
    assert not unexpected, f"newly unparseable: {unexpected}"
    assert not silently_ok, (
        f"now parse but are listed unsupported (update the list): {silently_ok}"
    )


def test_new_forms_reverse_roundtrip():
    for s in (
        "IMI2x2,PQ4np", "RQ4x6_Nqint8", "LSQ4x4_Ncqint4", "RCQ1x3_1x4",
        "IVF4,RQ4x6_Nfloat", "IVF4,LSQ4x4", "IVF8(LSHrt),Flat",
        "IVF8,PCA8,SHc", "RQ2x8_2x4",
        "IVF1024(RCQ2x5),SQ8", "IVF256(RCQ2x4),RQ3x4", "IVF64(LSQ2x3),SQ8",
    ):
        rev = reverse_index_factory(index_factory(s))
        # reverse must RE-PARSE to an equivalent plan (string-identical
        # for all of these except threshold-default rendering)
        index_factory(rev)
        if s != "IVF8,PCA8,SHc":
            assert rev == s, (s, rev)


def test_aq_16bit_levels_fail_loudly():
    plan = index_factory("RQ2x16_3x8_6x4")  # parses (reference accepts)
    with pytest.raises(NotImplementedError, match="byte-packed"):
        from faiss_spark.operators.codecs import ResidualQuantizer

        ResidualQuantizer(M=plan.rq_m, nbits=plan.aq_nbits)


def _emb(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


def test_idmap_suffix_is_plain_plan(spark, tables):
    emb = _emb(tables)
    qs = emb.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    a = index_factory("Flat,IDMap").fit(emb, seed=7).search(qs, 4)
    b = index_factory("Flat").fit(emb, seed=7).search(qs, 4)
    assert a.collect() == b.collect()


def test_rq_norm_estimator_matches_numpy(spark, tables):
    """The '_Nqint8' stored-norm estimator must rank by
    dist = ‖q‖² − 2⟨q,x̂⟩ + qint8(‖x̂‖²) exactly (ids AND distances)."""
    emb = _emb(tables)
    qs = emb.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    plan = index_factory("RQ4x6_Nqint8").fit(emb, seed=42)
    res = plan.search(qs, 5).toPandas().sort_values(["qid", "rank"])
    cd = plan._rq_codes.toPandas()
    C = plan._rq_model.decode_np(
        np.stack([np.frombuffer(c, np.uint8) for c in cd["code"]])
    )
    ids = cd["id"].to_numpy()
    n_est = plan._aq_norm.quantize_np((C * C).sum(1))
    qp = qs.toPandas()
    Q = np.stack(qp["vec"].to_numpy()).astype(np.float64)
    for qi, qid in enumerate(qp["qid"]):
        est = (Q[qi] ** 2).sum() - 2.0 * C @ Q[qi] + n_est
        order = np.lexsort((ids, est))[:5]
        got = res[res.qid == qid]
        assert (ids[order] == got["id"].to_numpy()).all()
        assert np.allclose(
            est[order], got["dist"].to_numpy(), atol=1e-9
        )


def test_ivfaq_norm_estimator_full_probe_matches_numpy(spark, tables):
    """IVF RQ with '_Ncqint8' at nprobe=nlist: every row scanned, so the
    result must equal the same estimator computed directly in numpy over
    ALL reconstructions (centroid + decode)."""
    emb = _emb(tables)
    qs = emb.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    plan = index_factory("IVF4,RQ4x6_Ncqint8").fit(emb, seed=42)
    idx = plan.index
    res = plan.search(qs, 5, nprobe=4).toPandas().sort_values(["qid", "rank"])
    cd = idx.codes.toPandas()
    codes = np.stack([np.frombuffer(c, np.uint8) for c in cd["code"]])
    Xh = idx.centroids[cd["list_no"].to_numpy()] + idx.rq.decode_np(codes)
    ids = cd["id"].to_numpy()
    n_est = idx.norm_q.quantize_np((Xh * Xh).sum(1))
    qp = qs.toPandas()
    Q = np.stack(qp["vec"].to_numpy()).astype(np.float64)
    for qi, qid in enumerate(qp["qid"]):
        est = (Q[qi] ** 2).sum() - 2.0 * Xh @ Q[qi] + n_est
        order = np.lexsort((ids, est))[:5]
        got = res[res.qid == qid]
        assert (ids[order] == got["id"].to_numpy()).all()
        assert np.allclose(est[order], got["dist"].to_numpy(), atol=1e-9)


def test_ivf_lsq_full_probe_is_codec_exact(spark, tables):
    """IVF,LSQ4x4 at full probe == brute-force L2 over the LSQ
    reconstructions (the decompress default) — pins that the ICM codec,
    not a beam encode, produced the stored codes."""
    from faiss_spark.operators.knn import knn

    emb = _emb(tables)
    qs = emb.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    plan = index_factory("IVF4,LSQ4x4").fit(emb, seed=42)
    idx = plan.index
    res = plan.search(qs, 5, nprobe=4).toPandas().sort_values(["qid", "rank"])
    cd = idx.codes.toPandas()
    codes = np.stack([np.frombuffer(c, np.uint8) for c in cd["code"]])
    # ICM encode must match the codec's own encoder on the residuals
    Xh = idx.centroids[cd["list_no"].to_numpy()] + idx.rq.decode_np(codes)
    ids = cd["id"].to_numpy()
    qp = qs.toPandas()
    Q = np.stack(qp["vec"].to_numpy()).astype(np.float64)
    for qi, qid in enumerate(qp["qid"]):
        d2 = ((Xh - Q[qi]) ** 2).sum(1)
        order = np.lexsort((ids, d2))[:5]
        got = res[res.qid == qid]
        assert (ids[order] == got["id"].to_numpy()).all()


def test_rcq_standalone_index(spark, tables):
    """RCQ1x3_1x4: search returns beam-ranked VIRTUAL centroid ids in
    [0, 2^7); per-query dists are non-decreasing with rank."""
    emb = _emb(tables)
    qs = emb.filter("id < 4").select(F.col("id").alias("qid"), "vec")
    plan = index_factory("RCQ1x3_1x4").fit(emb, seed=42)
    res = plan.search(qs, 5).toPandas().sort_values(["qid", "rank"])
    assert res["id"].between(0, (1 << 7) - 1).all()
    for _, grp in res.groupby("qid"):
        d = grp.sort_values("rank")["dist"].to_numpy()
        assert (np.diff(d) >= -1e-12).all()


def test_per_level_nbits_codes_in_range(spark, tables):
    """RQ2x8_2x4: levels 2-3 are 4-bit — every stored code must stay
    below 16 there (the poison-padded codebook rows are unreachable)."""
    emb = _emb(tables)
    plan = index_factory("RQ2x8_2x4").fit(emb, seed=42)
    codes = np.stack(
        [np.frombuffer(c, np.uint8) for c in plan._rq_codes.toPandas()["code"]]
    )
    assert codes.shape[1] == 4
    assert (codes[:, 2:] < 16).all()


def test_rcq_coarse_sq_full_probe_exact(spark, tables):
    """IVF<n>(RCQ<M>x<b>),SQ8 (reference tests/test_factory.py:254,
    tests/test_residual_quantizer.py:395) at nprobe=nlist: every virtual
    cell is probed, so the result must equal brute-force L2 over the SQ
    reconstructions REGARDLESS of where the beam assigned each vector."""
    emb = _emb(tables)
    qs = emb.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    plan = index_factory("IVF64(RCQ2x3),SQ8").fit(emb, seed=42)
    idx = plan.index
    res = plan.search(qs, 5, nprobe=64).toPandas().sort_values(["qid", "rank"])
    cd = idx.codes.toPandas()
    X = idx.sq.decode_np(
        np.stack([np.frombuffer(c, np.uint8) for c in cd["code"]])
    )
    ids = cd["id"].to_numpy()
    qp = qs.toPandas()
    Q = np.stack(qp["vec"].to_numpy()).astype(np.float64)
    for qi, qid in enumerate(qp["qid"]):
        d2 = ((X - Q[qi]) ** 2).sum(1)
        order = np.lexsort((ids, d2))[:5]
        got = res[res.qid == qid]
        assert (ids[order] == got["id"].to_numpy()).all()


def test_rcq_coarse_rq_full_probe_exact(spark, tables):
    """IVF<n>(RCQ<M>x<b>),RQ<spec> (reference
    tests/test_residual_quantizer.py:586,613) at full probe: ids AND
    distances must equal the numpy estimator over ALL reconstructions —
    virtual-centroid base (RCQ reconstruct of the stored list_no) plus
    the RQ decode of the residual code."""
    emb = _emb(tables)
    qs = emb.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    plan = index_factory("IVF64(RCQ2x3),RQ3x4").fit(emb, seed=42)
    idx = plan.index
    res = plan.search(qs, 5, nprobe=64).toPandas().sort_values(["qid", "rank"])
    cd = idx.codes.toPandas()
    codes = np.stack([np.frombuffer(c, np.uint8) for c in cd["code"]])
    Xh = idx.coarse_q.reconstruct_np(cd["list_no"].to_numpy()) + (
        idx.rq.decode_np(codes)
    )
    ids = cd["id"].to_numpy()
    qp = qs.toPandas()
    Q = np.stack(qp["vec"].to_numpy()).astype(np.float64)
    for qi, qid in enumerate(qp["qid"]):
        d2 = ((Xh - Q[qi]) ** 2).sum(1)
        order = np.lexsort((ids, d2))[:5]
        got = res[res.qid == qid]
        assert (ids[order] == got["id"].to_numpy()).all()
        assert np.allclose(d2[order], got["dist"].to_numpy(), atol=1e-9)


def test_rcq_coarse_rejects_unsupported_codes():
    with pytest.raises(ValueError, match="additive coarse"):
        index_factory("IVF64(RCQ2x3),PQ4")


def test_recursive_nested_coarse_roundtrip_and_depth():
    """parse_coarse_quantizer recursion (reference index_factory.cpp:228,
    841; its own tests build IVF1000(IVF20,SQ4,Refine(SQ8)),Flat —
    tests/test_factory.py:154): the composite sub-grammar round-trips,
    a third nesting level refuses loudly (never mis-builds)."""
    for s in (
        "IVF1000(IVF20,SQ4,Refine(SQ8)),Flat",
        "IVF64(SQ8),Flat",
        "IVF64(IVF8,PQ8,RFlat),Flat",
        "IVF64(IVF8,LSHt,Refine(SQ4)),Flat",
    ):
        rev = reverse_index_factory(index_factory(s))
        assert rev == s, (s, rev)
    with pytest.raises(ValueError, match="at most 2 levels"):
        index_factory("IVF64(IVF8(IVF2,Flat),Flat),Flat")
    with pytest.raises(ValueError, match="unsupported nested"):
        index_factory("IVF64(IVF8,NSG32),Flat")


def test_recursive_nested_coarse_full_probe_exact(spark, tables):
    """The reference's deep-recursive coarse string shape at nprobe =
    nlist: every cell is scanned whatever the composite router ranked,
    so the result equals brute-force L2 knn (the ★ property); a partial
    probe must return full k rows (pad-free candidate pooling)."""
    from faiss_spark.operators.knn import knn

    emb = _emb(tables)
    qs = emb.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    plan = index_factory("IVF32(IVF4,SQ4,Refine(SQ8)),Flat").fit(emb, seed=42)
    res = plan.search(qs, 5, nprobe=32).toPandas().sort_values(["qid", "rank"])
    ex = knn(emb, qs, 5).toPandas().sort_values(["qid", "rank"])
    assert (res["id"].to_numpy() == ex["id"].to_numpy()).all()
    assert plan.search(qs, 5, nprobe=4).count() == 15


def test_norm_quantizer_kinds():
    from faiss_spark.operators.codecs import AQNormQuantizer

    rng = np.random.default_rng(7)
    norms = rng.uniform(10, 50, 4000)
    for kind, tol in (
        ("float", 1e-4), ("qint8", 0.2), ("qint4", 2.0),
        ("cqint8", 0.5), ("cqint4", 4.0), ("rq2x4", 1.0), ("lsq2x4", 1.0),
    ):
        q = AQNormQuantizer(kind).fit_np(norms)
        est = q.quantize_np(norms)
        err = np.abs(est - norms).mean()
        assert err < tol, (kind, err)
    # qint8 must be the reference's exact uniform codec
    q = AQNormQuantizer("qint8").fit_np(norms)
    lo, hi = norms.min(), norms.max()
    i = np.clip(np.floor((norms - lo) / (hi - lo) * 256), 0, 255)
    assert np.allclose(q.quantize_np(norms), (i + 0.5) / 256 * (hi - lo) + lo)
