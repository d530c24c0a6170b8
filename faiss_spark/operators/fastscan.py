"""4-bit fast-scan search semantics: affine-quantized LUT scans.

Reference: faiss/IndexFastScan.h:15-28, faiss/IndexPQFastScan.h,
faiss/IndexIVFPQFastScan.h, faiss/utils/quantize_lut.h:13-25 and
quantize_lut.cpp:140-285 (quantize_LUT_and_bias).

The reference's fast-scan family changes two things versus plain ADC:

* WHAT is computed — per-query distance lookup tables are affine-quantized
  to uint8 (``original = quantized / a + per_column_min``), accumulated in
  SATURATING uint16, and the reported distance is the de-quantized
  ``acc / a + b``. The coefficient ``a`` is chosen so the whole-code sum
  fits the uint16 accumulator: ``a = min(255 / max_span_LUT,
  65535 / max_span_dis)`` (quantize_lut.cpp:153-165).
* HOW it is computed — codes are laid out in bbs-blocked SIMD registers
  and the gather is an AVX shuffle (faiss/impl/pq4_fast_scan.h).

The semantic half is reproduced here exactly, with the reference's
coefficient choices, so recall and the quantization-error envelope match.
The physical half (register layout) is out of scope per SURVEY §2.B —
numpy's vectorized gather over Arrow batches is this engine's vector
unit, and Tungsten/whole-stage-codegen owns the layout above it.

Scale shape: LUT construction is O(nq · nprobe · M · ksub · dsub) on the
driver (ksub is 16 for 4-bit codes — a few MB even at nq=10k), broadcast
once; the scan over the codes table is map-only over (pruned) partitions
with per-worker top-k partials, identical to the ADC scan plans pinned in
tests/test_plans.py.
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, Window

from faiss_spark.kernels import TopKAccumulator, as_matrix, pairwise_distances
from faiss_spark.operators.codecs import ProductQuantizerModel
from faiss_spark.operators.ivf import IVFPQIndex, collect_queries_bounded


# ------------------------------------------------------------ quantization


def _emit_group_candidates(qids, accs, qsels):
    """RecordBatch candidate emitter shared by the grouped fast-scan
    scans (one batch per touched list's accumulator)."""
    import pyarrow as pa

    for key, acc in accs.items():
        qidx, nid, nd = acc.emit()
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qids[qsels[key][qidx]], pa.int64()),
                pa.array(nid, pa.int64()),
                pa.array(nd, pa.float64()),
            ],
            names=["qid", "id", "dist"],
        )


def quantize_lut_flat(luts: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize per-query 2-D LUTs, no bias (reference
    quantize_lut.cpp:152-170, the ``!bias`` branch), vectorized over
    queries.

    luts: (nq, M, ksub) float. Returns (lutq uint8 (nq, M, ksub),
    a (nq,), b (nq,)) with ``true_lut[m, j] ≈ lutq[m, j] / a + min_m``
    and ``true_dist ≈ acc / a + b``.
    """
    luts = np.asarray(luts, np.float64)
    mins = luts.min(axis=2)  # (nq, M)
    spans = luts.max(axis=2) - mins
    max_span_lut = spans.max(axis=1)
    max_span_dis = spans.sum(axis=1)
    with np.errstate(divide="ignore"):
        a = np.minimum(255.0 / max_span_lut, 65535.0 / max_span_dis)
    a = np.where(np.isfinite(a), a, 1.0)  # degenerate all-constant LUTs
    b = mins.sum(axis=1)
    lutq = np.floor((luts - mins[:, :, None]) * a[:, None, None] + 0.5)
    np.clip(lutq, 0.0, 255.0, out=lutq)
    return lutq.astype(np.uint8), a, b


def quantize_lut_ivf(
    luts: np.ndarray, bias: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Quantize one query's per-probe 3-D LUTs + per-probe bias
    (reference quantize_lut.cpp:195-237, the 3-D ``biasq`` branch).

    luts: (nprobe, M, ksub); bias: (nprobe,) — the per-list additive term
    (0 for pure residual LUTs, the coarse term when precomputed tables
    split it out). Returns (lutq uint8, biasq uint16, a, b) with
    ``true_dist ≈ (biasq_j + acc) / a + b``.
    """
    luts = np.asarray(luts, np.float64)
    bias = np.asarray(bias, np.float64)
    mins = luts.min(axis=2)  # (nprobe, M)
    spans = luts.max(axis=2) - mins
    bias_min = bias.min()
    max_span_lut = spans.max()
    span_dis = (bias - bias_min) + spans.sum(axis=1)  # (nprobe,)
    max_span_dis = span_dis.max()
    bias2 = bias + mins.sum(axis=1)  # (nprobe,)
    b = float(bias2.min())
    with np.errstate(divide="ignore"):
        a = float(min(255.0 / max_span_lut, 65535.0 / max_span_dis))
    if not np.isfinite(a):
        a = 1.0
    lutq = np.floor((luts - mins[:, :, None]) * a + 0.5)
    np.clip(lutq, 0.0, 255.0, out=lutq)
    biasq = np.floor((bias2 - b) * a + 0.5)
    np.clip(biasq, 0.0, 65535.0, out=biasq)
    return lutq.astype(np.uint8), biasq.astype(np.uint16), a, b


def _saturating_lut_sum(
    lutq: np.ndarray,
    codes: np.ndarray,
    init: np.ndarray | None = None,
    row_weights: np.ndarray | None = None,
) -> np.ndarray:
    """acc[q, x] = sat16(init_q + Σ_m w_m · lutq[q, m, code[x, m]]).

    Addends are non-negative, so summing in uint32 and clipping once is
    bit-equal to the reference's per-add saturating uint16 chain.
    row_weights carries the AQ fast-scan NormTableScaler (norm rows
    accumulated norm_scale times); None = all ones.
    """
    nq = lutq.shape[0]
    n, M = codes.shape
    acc = np.zeros((nq, n), np.uint32)
    if init is not None:
        acc += init.astype(np.uint32)[:, None]
    cols = codes.astype(np.int64)
    for m in range(M):
        con = lutq[:, m, cols[:, m]].astype(np.uint32)
        if row_weights is not None and row_weights[m] != 1:
            con *= int(row_weights[m])
        acc += con
    return np.minimum(acc, 65535)


# ------------------------------------------------------------ flat PQ scan


def pq_fastscan_search(
    model: ProductQuantizerModel,
    codes_df: DataFrame,
    queries: DataFrame,
    k: int,
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """IndexPQFastScan search semantics (reference
    faiss/IndexPQFastScan.h, IndexFastScan.cpp compute_quantized_LUT):
    top-k over de-quantized uint16 LUT sums. 4-bit codes (ksub ≤ 16) per
    the reference's fast-scan constraint.

    Plan: broadcast quantized LUTs, one map-only pass over the codes
    table with per-worker top-k partials, then the k-row window merge —
    the same shape as ProductQuantizerModel._lut_search.
    """
    if model.ksub > 16:
        raise ValueError(
            f"fast-scan requires 4-bit codes (ksub ≤ 16), got ksub={model.ksub}"
        )
    spark = codes_df.sparkSession
    qids, Q = collect_queries_bounded(
        queries, qid_col, qvec_col, "pq_fastscan_search",
        d=model.codebooks.shape[0] * model.codebooks.shape[2],
    )
    luts = np.stack([model.distance_table(q) for q in Q])  # (nq, M, ksub)
    lutq, a, b = quantize_lut_flat(luts)
    bc = spark.sparkContext.broadcast((qids, lutq, a, b))
    k_ = k

    def scan(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_binary_matrix

        qids_, lutq_, a_, b_ = bc.value
        nq = len(qids_)
        acc = TopKAccumulator(nq, k_, largest=False)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            codes = arrow_binary_matrix(batch.column(1))
            D16 = _saturating_lut_sum(lutq_, codes)
            est = D16 / a_[:, None] + b_[:, None]
            acc.push(
                est,
                np.asarray(
                    batch.column(0).to_numpy(zero_copy_only=False), np.int64
                ),
            )
        qidx, nid, nd = acc.emit()
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qids_[qidx], pa.int64()),
                pa.array(nid, pa.int64()),
                pa.array(nd, pa.float64()),
            ],
            names=["qid", "id", "dist"],
        )

    cands = codes_df.select("id", "code").mapInArrow(
        scan, schema="qid bigint, id bigint, dist double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_)
        .select("qid", "id", "dist", "rank")
    )


# ------------------------------------------------------------ IVFPQ scan


@dataclass
class IVFPQFastScanIndex:
    """IndexIVFPQFastScan semantics (reference faiss/IndexIVFPQFastScan.h):
    IVF partition pruning + quantized-LUT ADC, both by_residual modes.

    by_residual=True (the ``x4fsr`` factory suffix): train/add/storage
    are the IVFPQIndex layout verbatim (4-bit residual codes partitioned
    by list_no); search builds per-(query, probe) residual LUTs jointly
    quantized per query (shared a/b across the query's probes,
    quantize_lut.cpp:195) so distances from different lists stay
    comparable in the merge.

    by_residual=False (plain ``x4fs`` — the reference's IVF fast-scan
    DEFAULT, index_factory.cpp:324-328): PQ is trained on and encodes
    the RAW vectors; search quantizes ONE LUT per query
    (quantize_lut_flat — the !bias branch) shared across every probe,
    so per-query LUT work is 1/nprobe of the residual mode's and at
    full probe the result EQUALS pq_fastscan_search over the same codes
    bit for bit (same codes, same LUT, same saturating arithmetic).
    """

    base: IVFPQIndex
    by_residual: bool = True

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        M: int = 8,
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 20,
        pq_niter: int = 15,
        by_residual: bool = True,
    ) -> "IVFPQFastScanIndex":
        if by_residual:
            return IVFPQFastScanIndex(
                base=IVFPQIndex.train(
                    vectors,
                    nlist,
                    M=M,
                    vec_col=vec_col,
                    seed=seed,
                    niter=niter,
                    pq_niter=pq_niter,
                    nbits=4,
                )
            )
        # non-residual: coarse k-means for pruning only; PQ trained on
        # the RAW sample (reference train_encoder with by_residual=false)
        from faiss_spark.operators.cluster import KMeans
        from faiss_spark.operators.codecs import _kmeans_np, _sampled_matrix

        km = KMeans(k=nlist, niter=niter, seed=seed).fit(
            vectors, vec_col=vec_col
        )
        X = _sampled_matrix(vectors, vec_col, 65536, seed)
        d = X.shape[1]
        if d % M:
            raise ValueError(f"d={d} not divisible by M={M}")
        dsub = d // M
        ksub = min(16, len(X))
        books = np.empty((M, ksub, dsub), np.float64)
        for m in range(M):
            books[m], _ = _kmeans_np(
                X[:, m * dsub : (m + 1) * dsub], ksub, pq_niter, seed + m
            )
        base = IVFPQIndex(
            centroids=km.centroids, pq=ProductQuantizerModel(codebooks=books)
        )
        return IVFPQFastScanIndex(base=base, by_residual=False)

    def add(self, vectors: DataFrame, **kw) -> "IVFPQFastScanIndex":
        if self.by_residual:
            self.base.add(vectors, **kw)
            return self
        return self._add_raw(vectors, **kw)

    def _add_raw(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec",
        path: str | None = None,
    ) -> "IVFPQFastScanIndex":
        """Map-only encode: assign list for pruning, PQ-encode the RAW
        vector (reference encode_vectors with by_residual=false)."""
        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast(
            (self.base.centroids, self.base.pq.codebooks)
        )

        def enc(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks

            C, books = bc.value
            pqm = ProductQuantizerModel(codebooks=books)
            cn = (C * C).sum(1)
            for ids, X, _ in arrow_id_vec_blocks(batches):
                d2 = (X * X).sum(1)[:, None] + cn[None, :] - 2.0 * (X @ C.T)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(d2.argmin(1).astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        pa.array(
                            list(map(bytes, pqm.encode_np(X))), pa.binary()
                        ),
                    ],
                    names=["list_no", "id", "code"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.col(vec_col).alias("vec"),
        )
        codes = src.mapInArrow(
            enc, schema="list_no int, id bigint, code binary"
        )
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy(
                "list_no"
            ).parquet(path)
            codes = spark.read.parquet(path)
            self.base.path = path
        self.base.codes = codes
        return self

    def save(self, path: str) -> "IVFPQFastScanIndex":
        """write_index: the IVFPQ layout plus the by_residual flag —
        reload reproduces the same LUT mode (per-probe residual LUTs vs
        the shared flat LUT)."""
        import os as _os

        from faiss_spark.sources import fsio

        self.base.save(path)
        fsio.write_json(
            self.base.codes.sparkSession,
            _os.path.join(path, "_ivfpqfs_meta.json"),
            {"by_residual": bool(self.by_residual)},
        )
        return self

    @staticmethod
    def load(spark, path: str) -> "IVFPQFastScanIndex":
        import os as _os

        from faiss_spark.sources import fsio

        meta = fsio.read_json(spark, _os.path.join(path, "_ivfpqfs_meta.json"))
        return IVFPQFastScanIndex(
            base=IVFPQIndex.load(spark, path),
            by_residual=meta["by_residual"],
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        base = self.base
        if base.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = base.codes.sparkSession
        C = base.centroids
        books = base.pq.codebooks
        M, ksub, dsub = books.shape
        if ksub > 16:
            raise ValueError(f"fast-scan requires 4-bit codes, got ksub={ksub}")
        nlist = len(C)
        nprobe = min(nprobe, nlist)

        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFPQFastScanIndex.search",
            d=C.shape[1],
            fallback=lambda: fastscan_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        nq = len(Q)
        CD = pairwise_distances(Q, C, "l2")
        probes = np.argsort(CD, axis=1, kind="stable")[:, :nprobe]  # (nq, nprobe)
        if not self.by_residual:
            return self._search_flat_lut(spark, qids, Q, probes, k)

        # Residual LUTs per (query, probe), quantized in QUERY BLOCKS so
        # only the uint8 tables persist on the driver: the float64
        # (blk, nprobe, M, ksub) LUT tensor and (blk, nprobe, d) residuals
        # are scratch per block (at nq=10k, nprobe=16 the full-tensor form
        # would hold ~330 MB; the kept lutq/biasq are ~nq·nprobe·M·ksub
        # bytes — a few MB)
        lutq = np.empty((nq, nprobe, M, ksub), np.uint8)
        biasq = np.empty((nq, nprobe), np.uint16)
        a = np.empty(nq)
        b = np.empty(nq)
        zero_bias = np.zeros(nprobe)
        blk = 256
        for s in range(0, nq, blk):
            e = min(nq, s + blk)
            R = Q[s:e, None, :] - C[probes[s:e]]  # (blk, nprobe, d)
            Rs = R.reshape(e - s, nprobe, M, dsub)
            luts = (
                (Rs * Rs).sum(3)[:, :, :, None]
                + (books * books).sum(2)[None, None, :, :]
                - 2.0 * np.einsum("qpmd,mkd->qpmk", Rs, books)
            )
            for qi in range(s, e):
                lutq[qi], biasq[qi], a[qi], b[qi] = quantize_lut_ivf(
                    luts[qi - s], zero_bias
                )

        probed_lists = sorted({int(c) for c in probes.ravel()})
        l2q: dict[int, list[tuple[int, int]]] = {c: [] for c in probed_lists}
        for qi in range(nq):
            for j, c in enumerate(probes[qi]):
                l2q[int(c)].append((qi, j))
        l2q_np = {
            c: (
                np.asarray([p[0] for p in v], np.int64),
                np.asarray([p[1] for p in v], np.int64),
            )
            for c, v in l2q.items()
        }
        bc = spark.sparkContext.broadcast((qids, lutq, biasq, a, b, l2q_np))
        k_ = k
        pruned = base.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            from faiss_spark.kernels import arrow_code_groups

            qids_, lutq_, biasq_, a_, b_, l2q_ = bc.value
            accs: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}
            for list_no, codes, ids in arrow_code_groups(batches):
                sel = l2q_.get(list_no)
                if sel is None or len(sel[0]) == 0:
                    continue
                qsel, jsel = sel
                D16 = _saturating_lut_sum(
                    lutq_[qsel, jsel], codes, init=biasq_[qsel, jsel]
                )
                est = D16 / a_[qsel][:, None] + b_[qsel][:, None]
                if list_no not in accs:
                    accs[list_no] = TopKAccumulator(len(qsel), k_, largest=False)
                    qsels[list_no] = qsel
                accs[list_no].push(est, ids)
            yield from _emit_group_candidates(qids_, accs, qsels)

        cands = pruned.select("list_no", "id", "code").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )

    def _search_flat_lut(self, spark, qids, Q, probes, k):
        """Non-residual scan: ONE quantize_lut_flat LUT per query shared
        across its probes (the reference's by_residual=false branch) —
        identical arithmetic to pq_fastscan_search, restricted to the
        probed partitions."""
        nq = len(Q)
        # LUT via the SAME distance_table arithmetic as pq_fastscan_search
        # (fastscan.py pq path / ProductQuantizerModel.distance_table):
        # the full-probe == flat-scan bit-identity depends on IDENTICAL
        # floats entering uint8 quantization — an algebraically-equal
        # expanded form (|q|²+|c|²−2⟨q,c⟩) can land a value on the other
        # side of a bin boundary (ADVICE r7).
        luts = np.stack([self.base.pq.distance_table(q) for q in Q])
        lutq, a, b = quantize_lut_flat(luts)
        probed_lists = sorted({int(c) for c in probes.ravel()})
        l2q: dict[int, list[int]] = {c: [] for c in probed_lists}
        for qi in range(nq):
            for c in probes[qi]:
                l2q[int(c)].append(qi)
        l2q_np = {c: np.asarray(v, np.int64) for c, v in l2q.items()}
        bc = spark.sparkContext.broadcast((qids, lutq, a, b, l2q_np))
        k_ = k
        pruned = self.base.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            from faiss_spark.kernels import arrow_code_groups

            qids_, lutq_, a_, b_, l2q_ = bc.value
            accs: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}
            for list_no, codes, ids in arrow_code_groups(batches):
                qsel = l2q_.get(list_no)
                if qsel is None or len(qsel) == 0:
                    continue
                D16 = _saturating_lut_sum(lutq_[qsel], codes)
                est = D16 / a_[qsel][:, None] + b_[qsel][:, None]
                if list_no not in accs:
                    accs[list_no] = TopKAccumulator(len(qsel), k_, largest=False)
                    qsels[list_no] = qsel
                accs[list_no].push(est, ids)
            yield from _emit_group_candidates(qids_, accs, qsels)

        cands = pruned.select("list_no", "id", "code").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )


def fastscan_search_preassigned(
    index: "IVFPQFastScanIndex",
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Fully-distributed big-batch IVF fast-scan search — the
    search_preassigned twin of IVFPQFastScanIndex (reference
    contrib/ivf_tools.py pattern over faiss/IndexIVFPQFastScan.h).

    Fast-scan's LUTs are quantized PER QUERY (by_residual: jointly over
    the query's probes so distances stay comparable in the merge,
    quantize_lut.cpp:195), so the distributed shape quantizes inside
    the probe-assignment map — each (qid, list_no) probe row carries
    its uint8 LUT bytes (M·ksub ≈ 128 B at 4-bit PQ8), bias, and the
    per-query (a, b) dequantization constants through the cogroup; the
    per-cell scan is then pure ``_saturating_lut_sum`` against the
    cell's codes with no codebook state at all. Arithmetic is the
    driver scan's bit for bit (same LUT floats entering the same uint8
    quantization, same saturating accumulation), for both by_residual
    modes."""
    from faiss_spark.operators.ivf import (
        _cand_table,
        _empty_cand_table,
        _window_topk,
        cogrouped_cell_scan,
    )

    base = index.base
    if base.codes is None:
        raise ValueError("index has no codes table; call add() first")
    C0 = base.centroids
    books0 = base.pq.codebooks
    M, ksub, dsub = books0.shape
    if ksub > 16:
        raise ValueError(f"fast-scan requires 4-bit codes, got ksub={ksub}")
    nprobe_ = min(nprobe, len(C0))
    by_res = index.by_residual
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((C0, books0))
    k_ = k

    def assign_probes(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_id_vec_blocks

        C, books = bc.value
        pqm = ProductQuantizerModel(codebooks=books)
        zero_bias = np.zeros(nprobe_)
        for qids, Q, _ in arrow_id_vec_blocks(batches):
            nq = len(Q)
            CD = pairwise_distances(Q, C, "l2")
            probes = np.argsort(CD, axis=1, kind="stable")[:, :nprobe_]
            if by_res:
                lutq = np.empty((nq, nprobe_, M, ksub), np.uint8)
                biasq = np.empty((nq, nprobe_), np.uint16)
                a = np.empty(nq)
                b = np.empty(nq)
                blk = 256  # float LUT tensor stays scratch per block
                for s in range(0, nq, blk):
                    e = min(nq, s + blk)
                    R = Q[s:e, None, :] - C[probes[s:e]]
                    Rs = R.reshape(e - s, nprobe_, M, dsub)
                    luts = (
                        (Rs * Rs).sum(3)[:, :, :, None]
                        + (books * books).sum(2)[None, None, :, :]
                        - 2.0 * np.einsum("qpmd,mkd->qpmk", Rs, books)
                    )
                    for qi in range(s, e):
                        lutq[qi], biasq[qi], a[qi], b[qi] = quantize_lut_ivf(
                            luts[qi - s], zero_bias
                        )
            else:
                # one flat LUT per query shared across its probes — the
                # same distance_table arithmetic as the driver path (an
                # algebraically-equal form can flip a uint8 bin)
                luts = np.stack([pqm.distance_table(q) for q in Q])
                lut1, a, b = quantize_lut_flat(luts)
                lutq = np.repeat(lut1[:, None, :, :], nprobe_, axis=1)
                biasq = np.zeros((nq, nprobe_), np.uint16)
            rep = np.repeat(np.arange(nq), nprobe_)
            lut_rows = lutq.reshape(nq * nprobe_, M * ksub)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qids[rep], pa.int64()),
                    pa.array(probes.astype(np.int32).ravel(), pa.int32()),
                    pa.array(list(map(bytes, lut_rows)), pa.binary()),
                    pa.array(biasq.ravel().astype(np.int32), pa.int32()),
                    pa.array(a[rep], pa.float64()),
                    pa.array(b[rep], pa.float64()),
                ],
                names=["qid", "list_no", "lut", "bias", "a", "b"],
            )

    q = queries.select(
        F.col(qid_col).cast("bigint").alias("qid"), F.col(qvec_col).alias("vec")
    )
    probes_df = q.mapInArrow(
        assign_probes,
        schema="qid bigint, list_no int, lut binary, bias int, a double, b double",
    )

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import arrow_binary_matrix, arrow_i64

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        qids_ = arrow_i64(ptab.column("qid"))
        lutq = arrow_binary_matrix(ptab.column("lut")).reshape(-1, M, ksub)
        bias = arrow_i64(ptab.column("bias")).astype(np.uint16)
        a_ = np.asarray(
            ptab.column("a").combine_chunks().to_numpy(zero_copy_only=False),
            np.float64,
        )
        b_ = np.asarray(
            ptab.column("b").combine_chunks().to_numpy(zero_copy_only=False),
            np.float64,
        )
        codes = arrow_binary_matrix(ctab.column("code"))
        ids = arrow_i64(ctab.column("id"))
        acc = TopKAccumulator(len(qids_), k_, largest=False)
        # saturation is per-element, so column-chunking the codes keeps
        # the uint16 chain bit-equal while bounding the uint32 scratch
        chunk = max(16, (1 << 22) // max(1, len(qids_)))
        for s in range(0, len(ids), chunk):
            D16 = _saturating_lut_sum(
                lutq, codes[s:s + chunk], init=bias if by_res else None
            )
            est = D16 / a_[:, None] + b_[:, None]
            acc.push(est, ids[s:s + chunk])
        qidx, nid, nd = acc.emit()
        return _cand_table(qids_[qidx], nid, nd)

    codes = base.codes.select("list_no", "id", "code")
    cands = cogrouped_cell_scan(base, probes_df, codes, max_cell_rows, scan_cell)
    return _window_topk(cands, k, largest=False)


# ------------------------------------------------------------ AQ fast-scan


def aq_quantize_lut(
    luts: np.ndarray, M_norm: int, norm_scale: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize per-query AQ LUTs (reference
    quantize_lut.cpp:287 aq_quantize_LUT_and_bias with nprobe=1,
    bias=0), vectorized over queries. The last M_norm rows are the
    (already norm_scale-divided) norm tables; their spans count
    norm_scale times toward the accumulator-fit bound because the scan
    accumulates them norm_scale times (NormTableScaler).

    luts: (nq, M + M_norm, ksub). Returns (lutq uint8, a (nq,), b (nq,)).
    """
    luts = np.asarray(luts, np.float64)
    nq, Mtot, ksub = luts.shape
    mins = luts.min(axis=2)  # (nq, Mtot)
    spans = luts.max(axis=2) - mins
    w = np.ones(Mtot)
    w[Mtot - M_norm :] = norm_scale
    max_span_lut = spans.max(axis=1)
    max_span_dis = (spans * w[None, :]).sum(axis=1)
    with np.errstate(divide="ignore"):
        a = np.minimum(255.0 / max_span_lut, 65535.0 / max_span_dis)
    a = np.where(np.isfinite(a), a, 1.0)
    b = mins.sum(axis=1)
    lutq = np.floor((luts - mins[:, :, None]) * a[:, None, None] + 0.5)
    np.clip(lutq, 0.0, 255.0, out=lutq)
    return lutq.astype(np.uint8), a, b


def _norm_encode(norms: np.ndarray, norm_books: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Greedy 2-level 1-D RQ encode of scalar norms (the ST_norm_rq2x4
    norm codec shared by the flat and IVF AQ fast-scan paths)."""
    c0 = np.abs(norms[:, None] - norm_books[0][None, :]).argmin(1)
    r = norms - norm_books[0][c0]
    c1 = np.abs(r[:, None] - norm_books[1][None, :]).argmin(1)
    return c0.astype(np.uint8), c1.astype(np.uint8)


def _norm_decode(codes: np.ndarray, M: int, norm_books: np.ndarray) -> np.ndarray:
    """decoded ‖x̂‖² from the two norm code bytes at columns M, M+1."""
    return (
        norm_books[0][codes[:, M].astype(np.int64)]
        + norm_books[1][codes[:, M + 1].astype(np.int64)]
    )


def _fit_norm_books(norms: np.ndarray, ksub: int, seed: int) -> np.ndarray:
    """Train the (2, ksub) scalar-norm codebooks (2-level residual
    k-means on the 1-D norm values)."""
    from faiss_spark.operators.codecs import _kmeans_np

    nb0, lab0 = _kmeans_np(norms[:, None], min(ksub, len(norms)), 10, seed)
    resid = norms - nb0[lab0, 0]
    nb1, _ = _kmeans_np(resid[:, None], min(ksub, len(resid)), 10, seed + 1)
    # pad short codebooks (tiny train sets) with the LAST real centroid:
    # a 0.0 pad would act as a spurious centroid in _norm_encode's argmin
    # and inflate the norm span in _estimate_norm_scale
    norm_books = np.empty((2, ksub))
    norm_books[0, : len(nb0)] = nb0[:, 0]
    norm_books[0, len(nb0):] = nb0[-1, 0]
    norm_books[1, : len(nb1)] = nb1[:, 0]
    norm_books[1, len(nb1):] = nb1[-1, 0]
    return norm_books


def _estimate_norm_scale(
    Qs: np.ndarray, codebooks: np.ndarray, norm_books: np.ndarray
) -> int:
    """Mean norm-span / ip-LUT-span over a query sample, rounded and
    floored at 1 (reference estimate_norm_scale +
    quantize_lut.cpp:328 aq_estimate_norm_scale)."""
    ip = -2.0 * np.einsum("qd,mkd->qmk", Qs, codebooks)
    ip_span = (ip.max(2) - ip.min(2)).max(1)
    norm_span = max(
        norm_books[0].max() - norm_books[0].min(),
        norm_books[1].max() - norm_books[1].min(),
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = float(np.mean(norm_span / ip_span))
    return int(round(max(scale, 1.0))) if np.isfinite(scale) else 1


@dataclass
class AQFastScanModel:
    """IndexAdditiveQuantizerFastScan, ST_norm_rq2x4 search semantics
    (reference faiss/IndexAdditiveQuantizerFastScan.cpp:155-185
    compute_float_LUT): codes are 4-bit RQ levels plus the vector's
    reconstruction norm ‖x̂‖² encoded by a 2-level 4-bit scalar RQ; the
    L2 estimate accumulates −2·⟨q, c_m⟩ inner-product LUTs and the norm
    tables, with the norm rows divided by norm_scale in the LUT and
    re-multiplied during accumulation (NormTableScaler) so they fit the
    uint8 range despite their larger span."""

    rq: "object"  # ResidualQuantizerModel (4-bit)
    norm_books: np.ndarray  # (2, ksub) scalar centroids per norm level
    norm_scale: int

    @property
    def M(self) -> int:
        return self.rq.M

    @property
    def ksub(self) -> int:
        return self.rq.ksub

    def encode_np(self, X: np.ndarray) -> np.ndarray:
        codes = self.rq.encode_np(X)  # (n, M)
        xhat = self.rq.decode_np(codes)
        norms = (xhat * xhat).sum(1)
        c0, c1 = _norm_encode(norms, self.norm_books)
        return np.concatenate([codes, c0[:, None], c1[:, None]], axis=1)

    def estimated_norm(self, codes: np.ndarray) -> np.ndarray:
        """decoded ‖x̂‖² from the two norm code bytes."""
        return _norm_decode(codes, self.M, self.norm_books)

    def float_luts(self, Q: np.ndarray) -> np.ndarray:
        """(nq, M+2, ksub) float LUTs: −2·⟨q, c_m⟩ rows then the
        norm_scale-divided norm tables (compute_float_LUT)."""
        nq = len(Q)
        ip = -2.0 * np.einsum("qd,mkd->qmk", Q, self.rq.codebooks)
        norm = np.broadcast_to(
            self.norm_books[None, :, :] / float(self.norm_scale),
            (nq, 2, self.ksub),
        )
        return np.concatenate([ip, norm], axis=1)


def train_aq_fastscan(
    vectors: "DataFrame",
    M: int = 16,
    niter: int = 10,
    seed: int = 1234,
    vec_col: str = "vec",
) -> AQFastScanModel:
    """Train 4-bit RQ codebooks + the 2×4-bit norm quantizer and estimate
    norm_scale from the training sample (reference
    IndexAdditiveQuantizerFastScan::estimate_norm_scale +
    quantize_lut.cpp:328 aq_estimate_norm_scale)."""
    from faiss_spark.operators.codecs import ResidualQuantizer, _sampled_matrix

    rq = ResidualQuantizer(M=M, nbits=4, niter=niter, seed=seed).fit(
        vectors, vec_col=vec_col
    )
    X = _sampled_matrix(vectors, vec_col, 16384, seed)
    xhat = rq.decode_np(rq.encode_np(X))
    norm_books = _fit_norm_books((xhat * xhat).sum(1), rq.ksub, seed)
    return AQFastScanModel(
        rq=rq,
        norm_books=norm_books,
        norm_scale=_estimate_norm_scale(
            X[: min(256, len(X))], rq.codebooks, norm_books
        ),
    )


def aq_fastscan_encode(
    model: AQFastScanModel,
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    from faiss_spark.operators.codecs import _map_codec

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        X = as_matrix(pdf[vec_col if vec_col in pdf else "vec"])
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(np.int64),
                "code": list(map(bytes, model.encode_np(X))),
            }
        )

    return _map_codec(df, id_col, vec_col, fn, "id bigint, code binary")


def aq_fastscan_search(
    model: AQFastScanModel,
    codes_df: DataFrame,
    queries: DataFrame,
    k: int,
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """L2 top-k over AQ fast-scan codes: quantized-LUT accumulation with
    the norm rows re-scaled during the scan; reported distance is the
    de-quantized estimate plus the per-query ‖q‖² constant."""
    spark = codes_df.sparkSession
    qids, Q = collect_queries_bounded(
        queries, qid_col, qvec_col, "aq_fastscan_search",
        d=model.rq.codebooks.shape[2],
    )
    luts = model.float_luts(Q)
    lutq, a, b = aq_quantize_lut(luts, M_norm=2, norm_scale=model.norm_scale)
    qsq = (Q * Q).sum(1)
    weights = np.ones(model.M + 2, np.int64)
    weights[model.M :] = model.norm_scale
    bc = spark.sparkContext.broadcast((qids, lutq, a, b, qsq, weights))
    k_ = k

    def scan(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_binary_matrix

        qids_, lutq_, a_, b_, qsq_, w_ = bc.value
        nq = len(qids_)
        acc = TopKAccumulator(nq, k_, largest=False)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            codes = arrow_binary_matrix(batch.column(1))
            D16 = _saturating_lut_sum(lutq_, codes, row_weights=w_)
            est = D16 / a_[:, None] + b_[:, None] + qsq_[:, None]
            acc.push(
                est,
                np.asarray(
                    batch.column(0).to_numpy(zero_copy_only=False), np.int64
                ),
            )
        qidx, nid, nd = acc.emit()
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qids_[qidx], pa.int64()),
                pa.array(nid, pa.int64()),
                pa.array(nd, pa.float64()),
            ],
            names=["qid", "id", "dist"],
        )

    cands = codes_df.select("id", "code").mapInArrow(
        scan, schema="qid bigint, id bigint, dist double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_)
        .select("qid", "id", "dist", "rank")
    )


# ------------------------------------------------------- IVF AQ fast-scan


def aq_quantize_lut_bias(
    luts: np.ndarray,
    bias: np.ndarray,
    M_norm: int,
    norm_scale: int,
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """One query's 2-D AQ LUT + per-probe bias quantization (reference
    quantize_lut.cpp:287 aq_quantize_LUT_and_bias): the LUT is SHARED
    across probes (rows = −2·⟨q, cb_m⟩ then the norm tables), the probe
    difference lives entirely in bias[j] = −2·⟨q, c_j⟩; norm rows count
    norm_scale times toward the accumulator-fit bound.

    luts: (M + M_norm, ksub); bias: (nprobe,). Returns
    (lutq uint8, biasq uint16, a, b)."""
    luts = np.asarray(luts, np.float64)
    bias = np.asarray(bias, np.float64)
    Mtot = luts.shape[0]
    mins = luts.min(axis=1)
    spans = luts.max(axis=1) - mins
    bias_min = bias.min()
    w = np.ones(Mtot)
    w[Mtot - M_norm :] = norm_scale
    max_span_lut = spans.max()
    max_span_dis = (bias.max() - bias_min) + (spans * w).sum()
    with np.errstate(divide="ignore"):
        a = float(min(255.0 / max_span_lut, 65535.0 / max_span_dis))
    if not np.isfinite(a):
        a = 1.0
    b = float(mins.sum() + bias_min)
    lutq = np.floor((luts - mins[:, None]) * a + 0.5)
    np.clip(lutq, 0.0, 255.0, out=lutq)
    biasq = np.floor((bias - bias_min) * a + 0.5)
    np.clip(biasq, 0.0, 65535.0, out=biasq)
    return lutq.astype(np.uint8), biasq.astype(np.uint16), a, b


@dataclass
class IVFAQFastScanIndex:
    """IndexIVFAdditiveQuantizerFastScan semantics (reference
    faiss/IndexIVFAdditiveQuantizerFastScan.cpp:352-401): codes are the
    4-bit RQ of the RESIDUAL plus the 2×4-bit-encoded FULL-vector norm
    ‖x̂‖², so one 2-D LUT serves every probe —

        d(q, x) = q² − 2⟨q, c_j⟩ − 2⟨q, r̂⟩ + ‖x̂‖²

    with −2⟨q, c_j⟩ carried as the per-probe bias. Storage is the
    standard partitioned (list_no, id, code) table; the scan prunes to
    probed partitions exactly like IVFPQ/IVFAQ."""

    centroids: np.ndarray
    rq: "object"  # 4-bit ResidualQuantizerModel (on residuals, or raw
    # vectors when by_residual=False)
    norm_books: np.ndarray  # (2, ksub) over full-vector norms
    norm_scale: int = 1
    codes: DataFrame | None = None
    #: reference semantics (index_factory.cpp:367-380): plain x4fs is
    #: by_residual=false — RQ trained on/encoding RAW vectors, no
    #: per-probe bias, so at full probe the scan is bit-identical to
    #: aq_fastscan_search over the same codes; x4fsr opts into the
    #: residual encoding above
    by_residual: bool = True

    @property
    def M(self) -> int:
        return self.rq.M

    @property
    def ksub(self) -> int:
        return self.rq.ksub

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        M: int = 16,
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 10,
        rq_niter: int = 10,
        by_residual: bool = True,
    ) -> "IVFAQFastScanIndex":
        from faiss_spark.operators.cluster import KMeans
        from faiss_spark.operators.codecs import (
            ResidualQuantizerModel,
            _kmeans_np,
            _sampled_matrix,
        )

        km = KMeans(k=nlist, niter=niter, seed=seed).fit(vectors, vec_col=vec_col)
        C = km.centroids
        if not by_residual:
            # coarse k-means for pruning only; the flat raw-vector AQ
            # fast-scan model IS the codec (train_aq_fastscan)
            model = train_aq_fastscan(
                vectors, M=M, niter=rq_niter, seed=seed, vec_col=vec_col
            )
            return IVFAQFastScanIndex(
                centroids=C,
                rq=model.rq,
                norm_books=model.norm_books,
                norm_scale=model.norm_scale,
                by_residual=False,
            )
        X = _sampled_matrix(vectors, vec_col, 16384, seed)
        d2 = (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
        lists = d2.argmin(1)
        resid = X - C[lists]
        ksub = min(16, len(resid))
        books = np.empty((M, ksub, X.shape[1]), np.float64)
        r = resid.copy()
        for m in range(M):
            books[m], labels = _kmeans_np(r, ksub, rq_niter, seed + m)
            r = r - books[m][labels]
        rq = ResidualQuantizerModel(codebooks=books, beam=4)
        # norm quantizer over FULL reconstructed norms ‖c + r̂‖²
        xhat = C[lists] + rq.decode_np(rq.encode_np(resid))
        norm_books = _fit_norm_books((xhat * xhat).sum(1), ksub, seed)
        # norm_scale from the training sample's ip-LUT spans
        # (estimate_norm_scale, IndexIVFAdditiveQuantizerFastScan.cpp:242)
        return IVFAQFastScanIndex(
            centroids=C,
            rq=rq,
            norm_books=norm_books,
            norm_scale=_estimate_norm_scale(
                X[: min(256, len(X))], books, norm_books
            ),
        )

    def add(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"
    ) -> "IVFAQFastScanIndex":
        spark = vectors.sparkSession
        by_res = self.by_residual
        # broadcast the MODEL, not bare codebooks: a ProductAQAdapter
        # must encode per-split on executors (a flat beam search over its
        # padded codebooks would produce different codes), and for plain
        # RQ the broadcast model is the identical encoder
        bc = spark.sparkContext.broadcast(
            (self.centroids, self.rq, self.norm_books)
        )

        def enc(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks

            C, rqm, nbk = bc.value
            cn = (C * C).sum(1)
            for ids, X, _ in arrow_id_vec_blocks(batches):
                d2 = (X * X).sum(1)[:, None] + cn[None, :] - 2.0 * (X @ C.T)
                lists = d2.argmin(1)
                if by_res:
                    rcodes = rqm.encode_np(X - C[lists])
                    xhat = C[lists] + rqm.decode_np(rcodes)
                else:
                    rcodes = rqm.encode_np(X)
                    xhat = rqm.decode_np(rcodes)
                c0, c1 = _norm_encode((xhat * xhat).sum(1), nbk)
                codes = np.concatenate(
                    [rcodes, c0[:, None], c1[:, None]], axis=1
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(lists.astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        pa.array(list(map(bytes, codes)), pa.binary()),
                    ],
                    names=["list_no", "id", "code"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        self.codes = src.mapInArrow(
            enc, schema="list_no int, id bigint, code binary"
        )
        return self

    def save(self, path: str) -> "IVFAQFastScanIndex":
        """write_index: partitioned (rcodes ++ norm-code) table +
        centroid/RQ-codebook/norm-codebook artifacts."""
        import os as _os

        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        from faiss_spark.sources import fsio

        fsio.write_npy(spark, _os.path.join(path, "_ivfaqfs_centroids.npy"), self.centroids)
        fsio.write_npy(spark, _os.path.join(path, "_ivfaqfs_codebooks.npy"), self.rq.codebooks)
        fsio.write_npy(spark, _os.path.join(path, "_ivfaqfs_norm_books.npy"), self.norm_books)
        meta = {
            "norm_scale": int(self.norm_scale),
            "by_residual": bool(self.by_residual),
            "beam": int(getattr(self.rq, "beam", 4)),
        }
        if isinstance(self.rq, ProductAQAdapter):
            # stamp the split structure so load rebuilds the PER-SPLIT
            # encoder (the padded codebooks alone reproduce decode/LUTs
            # but not PRQ/PLSQ encoding)
            from faiss_spark.operators.codecs import LocalSearchQuantizerModel

            sub0 = self.rq.paq.subs[0]
            # the meta stamps sub0's shape for ALL splits; a hand-built
            # adapter with heterogeneous splits would silently round-trip
            # to corrupted per-split slicing in _paq_adapter_from_books —
            # fail loudly instead (the trainer always produces uniform
            # splits, so this only rejects hand-built adapters)
            for s in self.rq.paq.subs[1:]:
                if (
                    s.M != sub0.M
                    or s.ksub != sub0.ksub
                    or type(s) is not type(sub0)
                    or int(getattr(s, "icm_iters", 3))
                    != int(getattr(sub0, "icm_iters", 3))
                ):
                    raise ValueError(
                        "IVFAQFastScanIndex.save: heterogeneous ProductAQ "
                        "splits (M/ksub/type/icm_iters differ) cannot be "
                        "persisted — the meta format stores one shared "
                        "split shape. Retrain with uniform splits."
                    )
            meta["paq"] = {
                "nsplits": len(self.rq.paq.subs),
                "msub": int(sub0.M),
                "lsq": isinstance(sub0, LocalSearchQuantizerModel),
                "icm_iters": int(getattr(sub0, "icm_iters", 3)),
            }
        fsio.write_json(spark, _os.path.join(path, "_ivfaqfs_meta.json"), meta)
        self.codes = spark.read.parquet(path)
        return self

    @staticmethod
    def load(spark, path: str) -> "IVFAQFastScanIndex":
        import os as _os

        from faiss_spark.operators.codecs import ResidualQuantizerModel
        from faiss_spark.sources import fsio

        meta = fsio.read_json(spark, _os.path.join(path, "_ivfaqfs_meta.json"))
        books = fsio.read_npy(
            spark, _os.path.join(path, "_ivfaqfs_codebooks.npy")
        )
        if "paq" in meta:
            pm = meta["paq"]
            rq = _paq_adapter_from_books(
                books, pm["nsplits"], pm["msub"], pm["lsq"], pm["icm_iters"]
            )
        else:
            rq = ResidualQuantizerModel(codebooks=books, beam=meta["beam"])
        return IVFAQFastScanIndex(
            centroids=fsio.read_npy(spark, _os.path.join(path, "_ivfaqfs_centroids.npy")),
            rq=rq,
            norm_books=fsio.read_npy(spark, _os.path.join(path, "_ivfaqfs_norm_books.npy")),
            norm_scale=meta["norm_scale"],
            codes=spark.read.parquet(path),
            by_residual=meta["by_residual"],
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        C = self.centroids
        M, ksub = self.M, self.ksub
        nlist = len(C)
        nprobe = min(nprobe, nlist)

        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFAQFastScanIndex.search",
            d=C.shape[1],
            fallback=lambda: aq_fastscan_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        nq = len(Q)
        CD = pairwise_distances(Q, C, "l2")
        probes = np.argsort(CD, axis=1, kind="stable")[:, :nprobe]
        # one 2-D LUT per query (shared across probes) — rows are exactly
        # AQFastScanModel.float_luts of the RQ (residual or raw)
        luts = AQFastScanModel(
            rq=self.rq, norm_books=self.norm_books, norm_scale=self.norm_scale
        ).float_luts(Q)  # (nq, M+2, ksub)
        if self.by_residual:
            qc = Q @ C.T  # ⟨q, c⟩ for the per-probe bias
            lutq = np.empty((nq, M + 2, ksub), np.uint8)
            biasq = np.empty((nq, nprobe), np.uint16)
            a = np.empty(nq)
            b = np.empty(nq)
            for qi in range(nq):
                bias = -2.0 * qc[qi, probes[qi]]
                lutq[qi], biasq[qi], a[qi], b[qi] = aq_quantize_lut_bias(
                    luts[qi], bias, M_norm=2, norm_scale=self.norm_scale
                )
        else:
            # no bias: the flat aq_fastscan quantization verbatim, so at
            # full probe results are bit-identical to aq_fastscan_search
            lutq, a, b = aq_quantize_lut(
                luts, M_norm=2, norm_scale=self.norm_scale
            )
            biasq = np.zeros((nq, nprobe), np.uint16)
        qsq = (Q * Q).sum(1)
        weights = np.ones(M + 2, np.int64)
        weights[M:] = self.norm_scale

        probed_lists = sorted({int(c) for c in probes.ravel()})
        l2q: dict[int, list[tuple[int, int]]] = {c: [] for c in probed_lists}
        for qi in range(nq):
            for j, c in enumerate(probes[qi]):
                l2q[int(c)].append((qi, j))
        l2q_np = {
            c: (
                np.asarray([p[0] for p in v], np.int64),
                np.asarray([p[1] for p in v], np.int64),
            )
            for c, v in l2q.items()
        }
        bc = spark.sparkContext.broadcast(
            (qids, lutq, biasq, a, b, qsq, weights, l2q_np)
        )
        k_ = k
        pruned = self.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            from faiss_spark.kernels import arrow_code_groups

            qids_, lutq_, biasq_, a_, b_, qsq_, w_, l2q_ = bc.value
            accs: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}
            for list_no, codes, ids in arrow_code_groups(batches):
                sel = l2q_.get(list_no)
                if sel is None or len(sel[0]) == 0:
                    continue
                qsel, jsel = sel
                D16 = _saturating_lut_sum(
                    lutq_[qsel],
                    codes,
                    init=biasq_[qsel, jsel],
                    row_weights=w_,
                )
                est = (
                    D16 / a_[qsel][:, None]
                    + b_[qsel][:, None]
                    + qsq_[qsel][:, None]
                )
                if list_no not in accs:
                    accs[list_no] = TopKAccumulator(len(qsel), k_, largest=False)
                    qsels[list_no] = qsel
                accs[list_no].push(est, ids)
            yield from _emit_group_candidates(qids_, accs, qsels)

        cands = pruned.select("list_no", "id", "code").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )


def aq_fastscan_search_preassigned(
    index: "IVFAQFastScanIndex",
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Distributed big-batch twin of IVFAQFastScanIndex.search
    (reference IndexIVFAdditiveQuantizerFastScan.cpp:352-401): the
    query map builds ONE 2-D LUT per query (AQFastScanModel.float_luts,
    shared across probes) and quantizes it with the per-probe
    −2⟨q,c_j⟩ bias exactly as the driver path, then each (qid, list_no)
    probe row ships (lut bytes, bias, a, b, ‖q‖²) through the cogroup —
    the per-cell scan is the same NormTableScaler saturating sum with
    no quantizer state. Covers both by_residual modes, PRQ/PLSQ
    included (the ProductAQAdapter rides inside rq)."""
    from faiss_spark.operators.ivf import (
        _cand_table,
        _empty_cand_table,
        _window_topk,
        cogrouped_cell_scan,
    )

    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    M, ksub = index.M, index.ksub
    norm_scale = index.norm_scale
    by_res = index.by_residual
    nprobe_ = min(nprobe, len(index.centroids))
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(
        (index.centroids, index.rq, index.norm_books)
    )
    k_ = k

    def assign_probes(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_id_vec_blocks

        C, rq, norm_books = bc.value
        model = AQFastScanModel(
            rq=rq, norm_books=norm_books, norm_scale=norm_scale
        )
        for qids, Q, _ in arrow_id_vec_blocks(batches):
            nq = len(Q)
            CD = pairwise_distances(Q, C, "l2")
            probes = np.argsort(CD, axis=1, kind="stable")[:, :nprobe_]
            luts = model.float_luts(Q)  # (nq, M+2, ksub)
            if by_res:
                qc = Q @ C.T
                lutq = np.empty((nq, M + 2, ksub), np.uint8)
                biasq = np.empty((nq, nprobe_), np.uint16)
                a = np.empty(nq)
                b = np.empty(nq)
                for qi in range(nq):
                    bias = -2.0 * qc[qi, probes[qi]]
                    lutq[qi], biasq[qi], a[qi], b[qi] = aq_quantize_lut_bias(
                        luts[qi], bias, M_norm=2, norm_scale=norm_scale
                    )
            else:
                lutq, a, b = aq_quantize_lut(
                    luts, M_norm=2, norm_scale=norm_scale
                )
                biasq = np.zeros((nq, nprobe_), np.uint16)
            qsq = (Q * Q).sum(1)
            rep = np.repeat(np.arange(nq), nprobe_)
            lut_rows = lutq.reshape(nq, -1)[rep]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qids[rep], pa.int64()),
                    pa.array(probes.astype(np.int32).ravel(), pa.int32()),
                    pa.array(list(map(bytes, lut_rows)), pa.binary()),
                    pa.array(biasq.ravel().astype(np.int32), pa.int32()),
                    pa.array(a[rep], pa.float64()),
                    pa.array(b[rep], pa.float64()),
                    pa.array(qsq[rep], pa.float64()),
                ],
                names=["qid", "list_no", "lut", "bias", "a", "b", "qsq"],
            )

    q = queries.select(
        F.col(qid_col).cast("bigint").alias("qid"), F.col(qvec_col).alias("vec")
    )
    probes_df = q.mapInArrow(
        assign_probes,
        schema=(
            "qid bigint, list_no int, lut binary, bias int, "
            "a double, b double, qsq double"
        ),
    )

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import arrow_binary_matrix, arrow_i64

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        qids_ = arrow_i64(ptab.column("qid"))
        lutq = arrow_binary_matrix(ptab.column("lut")).reshape(-1, M + 2, ksub)
        bias = arrow_i64(ptab.column("bias")).astype(np.uint16)

        def f64(name):
            return np.asarray(
                ptab.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
                np.float64,
            )

        a_, b_, qsq_ = f64("a"), f64("b"), f64("qsq")
        codes = arrow_binary_matrix(ctab.column("code"))
        ids = arrow_i64(ctab.column("id"))
        weights = np.ones(M + 2, np.int64)
        weights[M:] = norm_scale
        acc = TopKAccumulator(len(qids_), k_, largest=False)
        chunk = max(16, (1 << 22) // max(1, len(qids_)))
        for s in range(0, len(ids), chunk):
            D16 = _saturating_lut_sum(
                lutq, codes[s:s + chunk], init=bias, row_weights=weights
            )
            est = D16 / a_[:, None] + b_[:, None] + qsq_[:, None]
            acc.push(est, ids[s:s + chunk])
        qidx, nid, nd = acc.emit()
        return _cand_table(qids_[qidx], nid, nd)

    codes = index.codes.select("list_no", "id", "code")
    cands = cogrouped_cell_scan(
        index, probes_df, codes, max_cell_rows, scan_cell
    )
    return _window_topk(cands, k, largest=False)


# --------------------------------------- product-AQ fast-scan (PRQ/PLSQ)


class ProductAQAdapter:
    """Present a ProductAdditiveQuantizerModel as a plain additive
    quantizer: a product of additive quantizers IS an additive quantizer
    whose per-split codebooks are zero-padded to full dimension
    (reference faiss/impl/ProductAdditiveQuantizer.h:28 derives from
    AdditiveQuantizer exactly this way — decode and LUT math are the
    ordinary gather-sum over (M_total, ksub, d) codebooks, while ENCODING
    stays per-split). With the adapter every AQ fast-scan code path
    (float_luts, quantization, norm books, flat + IVF scans, save/load)
    works unchanged for PRQ/PLSQ (reference index_factory.cpp:381-395
    IndexIVFProduct{Residual,LocalSearch}QuantizerFastScan and :625-640
    the flat forms)."""

    def __init__(self, paq, beam: int = 4):
        self.paq = paq
        self.beam = beam
        subs = paq.subs
        dsub = paq.dsub
        d = dsub * len(subs)
        ksubs = {s.codebooks.shape[1] for s in subs}
        if len(ksubs) != 1:
            raise ValueError(
                f"PRQ/PLSQ fast-scan needs a uniform ksub across splits, "
                f"got {sorted(ksubs)}"
            )
        m_total = sum(s.M for s in subs)
        books = np.zeros((m_total, ksubs.pop(), d), np.float64)
        off = 0
        for s_i, s in enumerate(subs):
            books[off : off + s.M, :, s_i * dsub : (s_i + 1) * dsub] = (
                s.codebooks
            )
            off += s.M
        self.codebooks = books

    @property
    def M(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    def encode_np(self, X: np.ndarray) -> np.ndarray:
        return self.paq.encode_np(X)

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        return self.paq.decode_np(codes)


def _paq_adapter_from_books(
    books: np.ndarray, nsplits: int, msub: int, lsq: bool, icm_iters: int = 3
) -> ProductAQAdapter:
    """Rebuild a ProductAQAdapter from the persisted PADDED codebooks by
    slicing each split's block back out — save/load round-trips the
    per-split encode semantics, not just the decode/LUT math."""
    from faiss_spark.operators.codecs import (
        LocalSearchQuantizerModel,
        ProductAdditiveQuantizerModel,
        ResidualQuantizerModel,
    )

    d = books.shape[2]
    dsub = d // nsplits
    subs = []
    for s in range(nsplits):
        blk = np.ascontiguousarray(
            books[s * msub : (s + 1) * msub, :, s * dsub : (s + 1) * dsub]
        )
        subs.append(
            LocalSearchQuantizerModel(codebooks=blk, icm_iters=icm_iters)
            if lsq
            else ResidualQuantizerModel(codebooks=blk, beam=4)
        )
    return ProductAQAdapter(
        ProductAdditiveQuantizerModel(subs=subs, dsub=dsub)
    )


def train_paq_fastscan(
    vectors: "DataFrame",
    nsplits: int = 2,
    Msub: int = 2,
    lsq: bool = False,
    niter: int = 10,
    seed: int = 1234,
    vec_col: str = "vec",
) -> AQFastScanModel:
    """Train a 4-bit PRQ/PLSQ codec + the 2x4-bit norm quantizer: the
    flat IndexProduct{Residual,LocalSearch}QuantizerFastScan of the
    reference (index_factory.cpp:625-640), searched through the SAME
    ST_norm_rq2x4 LUT machinery as RQ fast-scan."""
    from faiss_spark.operators.codecs import (
        ProductAdditiveQuantizer,
        _sampled_matrix,
    )

    paq = ProductAdditiveQuantizer(
        nsplits=nsplits, M_per_split=Msub, nbits=4, niter=niter, seed=seed,
        lsq=lsq,
    ).fit(vectors, vec_col=vec_col)
    rq = ProductAQAdapter(paq)
    X = _sampled_matrix(vectors, vec_col, 16384, seed)
    xhat = rq.decode_np(rq.encode_np(X))
    norm_books = _fit_norm_books((xhat * xhat).sum(1), rq.ksub, seed)
    return AQFastScanModel(
        rq=rq,
        norm_books=norm_books,
        norm_scale=_estimate_norm_scale(
            X[: min(256, len(X))], rq.codebooks, norm_books
        ),
    )


def train_ivf_paq_fastscan(
    vectors: "DataFrame",
    nlist: int,
    nsplits: int = 2,
    Msub: int = 2,
    lsq: bool = False,
    vec_col: str = "vec",
    seed: int = 1234,
    niter: int = 10,
    paq_niter: int = 10,
    by_residual: bool = True,
) -> "IVFAQFastScanIndex":
    """IVF<n>,PRQ/PLSQ<ns>x<M>x4fs[r] (reference index_factory.cpp:381-395):
    coarse k-means + 4-bit product-additive codes, searched through the
    IVFAQFastScanIndex machinery via the ProductAQAdapter. Plain x4fs =
    by_residual=false (codec on RAW vectors, one shared LUT per query —
    at full probe bit-identical to the flat PRQ fast-scan over the same
    codes); x4fsr encodes residuals, built by feeding the residual frame
    (map-only, broadcast centroids) to the SAME distributed PAQ trainer
    the flat codec uses."""
    from faiss_spark.operators.cluster import KMeans
    from faiss_spark.operators.codecs import (
        ProductAdditiveQuantizer,
        _sampled_matrix,
    )

    km = KMeans(k=nlist, niter=niter, seed=seed).fit(vectors, vec_col=vec_col)
    C = km.centroids
    if not by_residual:
        model = train_paq_fastscan(
            vectors, nsplits=nsplits, Msub=Msub, lsq=lsq, niter=paq_niter,
            seed=seed, vec_col=vec_col,
        )
        return IVFAQFastScanIndex(
            centroids=C,
            rq=model.rq,
            norm_books=model.norm_books,
            norm_scale=model.norm_scale,
            by_residual=False,
        )
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def to_resid(batches):
        import pyarrow as pa

        C_ = bc.value
        cn = (C_ * C_).sum(1)
        for b in batches:
            if b.num_rows == 0:
                continue
            X = np.asarray(
                b.column(0).flatten().to_numpy(zero_copy_only=False),
                dtype=np.float64,
            ).reshape(b.num_rows, -1)
            d2 = (X * X).sum(1)[:, None] + cn[None, :] - 2.0 * (X @ C_.T)
            resid = X - C_[d2.argmin(1)]
            n, d = resid.shape
            offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
            vals = pa.array(resid.ravel(), pa.float64())
            yield pa.RecordBatch.from_arrays(
                [pa.ListArray.from_arrays(offsets, vals)], names=["vec"]
            )

    resid_df = vectors.select(F.col(vec_col).alias("vec")).mapInArrow(
        to_resid, schema="vec array<double>"
    )
    paq = ProductAdditiveQuantizer(
        nsplits=nsplits, M_per_split=Msub, nbits=4, niter=paq_niter,
        seed=seed, lsq=lsq,
    ).fit(resid_df, vec_col="vec")
    rq = ProductAQAdapter(paq)
    # norm quantizer over FULL reconstructed norms ||c + r^||^2
    X = _sampled_matrix(vectors, vec_col, 16384, seed)
    d2 = (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
    lists = d2.argmin(1)
    xhat = C[lists] + rq.decode_np(rq.encode_np(X - C[lists]))
    norm_books = _fit_norm_books((xhat * xhat).sum(1), rq.ksub, seed)
    return IVFAQFastScanIndex(
        centroids=C,
        rq=rq,
        norm_books=norm_books,
        norm_scale=_estimate_norm_scale(
            X[: min(256, len(X))], rq.codebooks, norm_books
        ),
    )
