"""Quantizer codecs: ScalarQuantizer, ProductQuantizer — SURVEY §2.D.

Reference: faiss/impl/ScalarQuantizer.h:26-48 (QT_8bit/4bit/fp16 &c),
faiss/impl/ProductQuantizer.h:25-147. A codec is an estimator producing a
small artifact (ranges / codebooks) plus `encode` (vec -> BINARY column)
and `decode` (BINARY -> vec) distributed transforms — the Spark face of
``sa_encode``/``sa_decode`` (faiss/Index.h:255-271).

Encoded tables keep the (id, code BINARY) layout of IndexFlatCodes
(faiss/IndexFlatCodes.h:23-28); `adc_search` scans codes with a per-query
lookup table exactly like IndexPQ's ADC (faiss/IndexPQ.h:24).

Quantization semantics (match the reference so error bounds carry over):
  SQ8/SQ4: code = floor((x − vmin) / unit), clamped to [0, 2^bits − 1];
  decode  = vmin + (code + 0.5) · unit   (ScalarQuantizer.cpp Codec8bit)
  fp16   : IEEE half roundtrip via numpy float16.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from faiss_spark.kernels import TopKAccumulator, as_matrix


def _kmeans_np(X: np.ndarray, k: int, niter: int, seed: int) -> tuple:
    """Small deterministic Lloyd's for codebook training (driver-side,
    used for PQ sub-spaces and OPQ; same role as Clustering with
    a temp IndexFlat in the reference)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = X[rng.permutation(len(X))[:k]].copy()
    labels = None
    for _ in range(niter):
        # argmin needs only ||c||² − 2x·c (||x||² is constant per row);
        # GEMM form instead of an n×k×d broadcast temp
        d2 = (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
        labels = d2.argmin(1)
        # scatter-add centroid update (no per-cluster python loop)
        sums = np.zeros_like(C)
        np.add.at(sums, labels, X)
        counts = np.bincount(labels, minlength=k)
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz, None]
    return C, labels


def _sampled_matrix(df: DataFrame, vec_col: str, max_train: int, seed: int):
    n = df.count()
    sample = df.select(vec_col)
    if n > max_train:
        frac = min(1.0, 1.2 * max_train / n)
        sample = sample.sample(fraction=frac, seed=seed).limit(max_train)
    return as_matrix(sample.toPandas()[vec_col])


def _map_codec(df: DataFrame, id_col: str, in_col: str, fn, out_schema: str):
    src = df.select(F.col(id_col).cast("bigint").alias("id"), F.col(in_col))

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield fn(pdf)

    return src.mapInPandas(do, schema=out_schema)


# ============================================================ ScalarQuantizer


@dataclass
class ScalarQuantizerModel:
    """Per-dimension linear quantizer (reference ScalarQuantizer, trained
    ranges = per-dim min/max, faiss/impl/ScalarQuantizer.h:40-48)."""

    vmin: np.ndarray  # (d,)
    vdiff: np.ndarray  # (d,)
    bits: int  # 8, 4, or 16 (fp16)

    @property
    def d(self) -> int:
        return len(self.vmin)

    def code_size(self) -> int:
        """Bytes per vector (reference sa_code_size)."""
        if self.bits == 16:
            return 2 * self.d
        return (self.d * self.bits + 7) // 8

    # -- numpy kernels (shared by the distributed transforms) --------------
    def encode_np(self, X: np.ndarray) -> np.ndarray:
        if self.bits == 16:
            return X.astype(np.float16).view(np.uint8).reshape(len(X), -1)
        levels = (1 << self.bits) - 1
        unit = self.vdiff / (levels + 1)
        unit[unit == 0] = 1.0
        q = np.floor((X - self.vmin) / unit)
        q = np.clip(q, 0, levels).astype(np.uint8)
        if self.bits == 8:
            return q
        # 4-bit: pack two components per byte, low nibble first
        if self.d % 2:
            q = np.concatenate([q, np.zeros((len(q), 1), np.uint8)], axis=1)
        return (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8)

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        if self.bits == 16:
            return codes.view(np.float16).astype(np.float64)
        levels = (1 << self.bits) - 1
        unit = self.vdiff / (levels + 1)
        if self.bits == 8:
            q = codes.astype(np.float64)
        else:
            lo = codes & 0x0F
            hi = codes >> 4
            q = np.empty((len(codes), codes.shape[1] * 2), np.float64)
            q[:, 0::2] = lo
            q[:, 1::2] = hi
            q = q[:, : self.d]
        return self.vmin + (q + 0.5) * unit

    # -- distributed transforms --------------------------------------------
    def encode(self, df: DataFrame, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            X = as_matrix(pdf[vec_col if vec_col in pdf else "vec"])
            codes = model.encode_np(X)
            return pd.DataFrame(
                {"id": pdf["id"].to_numpy(np.int64), "code": list(map(bytes, codes))}
            )

        return _map_codec(df, id_col, vec_col, fn, "id bigint, code binary")

    def decode(self, df: DataFrame, id_col: str = "id", code_col: str = "code") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            codes = np.stack([np.frombuffer(c, np.uint8) for c in pdf[code_col]])
            X = model.decode_np(codes)
            return pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "vec": list(X.astype(np.float32)),
                }
            )

        return _map_codec(df, id_col, code_col, fn, "id bigint, vec array<float>")


class ScalarQuantizer:
    """Estimator: per-dim min/max ranges via one distributed aggregation
    (exact — the QT_*_uniform 'trained range' form uses global min/max)."""

    def __init__(self, bits: int = 8):
        if bits not in (4, 8, 16):
            raise ValueError("bits must be 4, 8 (int codes) or 16 (fp16)")
        self.bits = bits

    def fit(self, df: DataFrame, vec_col: str = "vec") -> ScalarQuantizerModel:
        d = df.select(F.size(vec_col)).first()[0]
        if self.bits == 16:
            return ScalarQuantizerModel(
                vmin=np.zeros(d), vdiff=np.ones(d), bits=16
            )
        # exact per-dimension min/max: posexplode + agg (map-side partials)
        stats = (
            df.select(F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
            .orderBy("pos")
            .collect()
        )
        vmin = np.array([r["lo"] for r in stats], dtype=np.float64)
        vmax = np.array([r["hi"] for r in stats], dtype=np.float64)
        return ScalarQuantizerModel(vmin=vmin, vdiff=vmax - vmin, bits=self.bits)


# =========================================================== ProductQuantizer


@dataclass
class ProductQuantizerModel:
    """M sub-space codebooks, (M, ksub, dsub) — reference
    faiss/impl/ProductQuantizer.h:25-147."""

    codebooks: np.ndarray  # (M, ksub, dsub) float64

    @property
    def M(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    def code_size(self) -> int:
        return self.M  # 8-bit codes: one byte per sub-space

    def encode_np(self, X: np.ndarray) -> np.ndarray:
        n = len(X)
        codes = np.empty((n, self.M), np.uint8)
        for m in range(self.M):
            sub = X[:, m * self.dsub : (m + 1) * self.dsub]
            C = self.codebooks[m]
            d2 = (
                (sub * sub).sum(1)[:, None]
                + (C * C).sum(1)[None, :]
                - 2.0 * (sub @ C.T)
            )
            codes[:, m] = d2.argmin(1)
        return codes

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        n = len(codes)
        X = np.empty((n, self.M * self.dsub), np.float64)
        for m in range(self.M):
            X[:, m * self.dsub : (m + 1) * self.dsub] = self.codebooks[m][
                codes[:, m]
            ]
        return X

    def distance_table(self, q: np.ndarray) -> np.ndarray:
        """(M, ksub) per-query ADC lookup table (reference
        compute_distance_table, ProductQuantizer.h:103)."""
        T = np.empty((self.M, self.ksub), np.float64)
        for m in range(self.M):
            sub = q[m * self.dsub : (m + 1) * self.dsub]
            T[m] = ((self.codebooks[m] - sub) ** 2).sum(1)
        return T

    def encode(self, df: DataFrame, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            X = as_matrix(pdf[vec_col if vec_col in pdf else "vec"])
            return pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "code": list(map(bytes, model.encode_np(X))),
                }
            )

        return _map_codec(df, id_col, vec_col, fn, "id bigint, code binary")

    def decode(self, df: DataFrame, id_col: str = "id", code_col: str = "code") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            codes = np.stack([np.frombuffer(c, np.uint8) for c in pdf[code_col]])
            return pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "vec": list(model.decode_np(codes).astype(np.float32)),
                }
            )

        return _map_codec(df, id_col, code_col, fn, "id bigint, vec array<float>")

    def adc_search(
        self,
        codes_df: DataFrame,
        queries: DataFrame,
        k: int,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        """Asymmetric-distance top-k over an encoded table: per-partition
        LUT gather-sum (the IndexPQ ADC scan, reference faiss/IndexPQ.h:24;
        LUT trick of faiss/impl/ProductQuantizer.h:117 'search')."""
        spark = codes_df.sparkSession
        qpdf = queries.select(qid_col, qvec_col).toPandas()
        qids = qpdf[qid_col].to_numpy(np.int64)
        Q = as_matrix(qpdf[qvec_col])
        luts = np.stack([self.distance_table(q) for q in Q])  # (nq, M, ksub)
        bc = spark.sparkContext.broadcast((qids, luts))
        k_ = k

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qids_, luts_ = bc.value
            nq, M, ksub = luts_.shape
            flat = luts_.reshape(nq, M * ksub)
            offs = (np.arange(M) * ksub).astype(np.int64)
            acc = TopKAccumulator(nq, k_, largest=False)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                codes = np.stack([np.frombuffer(c, np.uint8) for c in pdf["code"]])
                idx = codes.astype(np.int64) + offs[None, :]  # (n, M)
                # D[q, x] = sum_m lut[q, m, code[x, m]]
                D = flat[:, idx].sum(axis=2)  # (nq, n)
                acc.push(D, pdf["id"].to_numpy(np.int64))
            qidx, nid, nd = acc.emit()
            yield pd.DataFrame({"qid": qids_[qidx], "id": nid, "dist": nd})

        cands = codes_df.select("id", "code").mapInPandas(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )


class ProductQuantizer:
    """Estimator: M independent k-means on a seeded driver sample (the
    reference trains PQ on a subsample too)."""

    def __init__(
        self, M: int = 8, nbits: int = 8, niter: int = 25, seed: int = 1234,
        max_train_points: int = 65536,
    ):
        if nbits != 8:
            raise NotImplementedError("8-bit PQ codes only (ksub=256)")
        self.M = M
        self.ksub = 1 << nbits
        self.niter = niter
        self.seed = seed
        self.max_train_points = max_train_points

    def fit(self, df: DataFrame, vec_col: str = "vec") -> ProductQuantizerModel:
        X = _sampled_matrix(df, vec_col, self.max_train_points, self.seed)
        d = X.shape[1]
        if d % self.M:
            raise ValueError(f"d={d} not divisible by M={self.M}")
        dsub = d // self.M
        ksub = min(self.ksub, len(X))
        books = np.empty((self.M, ksub, dsub), np.float64)
        for m in range(self.M):
            C, _ = _kmeans_np(
                X[:, m * dsub : (m + 1) * dsub], ksub, self.niter, self.seed + m
            )
            books[m] = C
        return ProductQuantizerModel(codebooks=books)


# ========================================================= ResidualQuantizer


@dataclass
class ResidualQuantizerModel:
    """M additive codebooks over successive residuals (reference
    faiss/impl/ResidualQuantizer.h:25; AdditiveQuantizer decode =
    gather-sum, faiss/impl/AdditiveQuantizer.h:25)."""

    codebooks: np.ndarray  # (M, ksub, d) float64
    beam: int = 4

    @property
    def M(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    def code_size(self) -> int:
        return self.M  # 8-bit per level

    def encode_np(self, X: np.ndarray) -> np.ndarray:
        """Beam-search encoding (reference max_beam_size semantics):
        keep `beam` best prefix expansions per vector per level."""
        n, d = X.shape
        B = self.beam
        # beams: residuals (n, B, d); codes (n, B, M)
        resid = X[:, None, :].copy()  # start with beam=1
        codes = np.zeros((n, 1, self.M), np.uint8)
        for m in range(self.M):
            C = self.codebooks[m]  # (ksub, d)
            b = resid.shape[1]
            # candidate residuals: (n, b, ksub, d)
            cand = resid[:, :, None, :] - C[None, None, :, :]
            errs = (cand**2).sum(3).reshape(n, b * self.ksub)
            keep = min(B, b * self.ksub)
            sel = np.argpartition(errs, keep - 1, axis=1)[:, :keep]
            # order selections for determinism
            row = np.arange(n)[:, None]
            sel = np.take_along_axis(
                sel, np.argsort(errs[row, sel], axis=1, kind="stable"), axis=1
            )
            b_idx = sel // self.ksub
            k_idx = (sel % self.ksub).astype(np.uint8)
            resid = cand.reshape(n, b * self.ksub, d)[row, sel]
            new_codes = np.take_along_axis(
                codes, b_idx[:, :, None], axis=1
            ).copy()
            new_codes[:, :, m] = k_idx
            codes = new_codes
        return codes[:, 0, :]  # best beam

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        out = np.zeros((len(codes), self.codebooks.shape[2]), np.float64)
        for m in range(self.M):
            out += self.codebooks[m][codes[:, m]]
        return out

    def encode(self, df: DataFrame, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            X = as_matrix(pdf[vec_col if vec_col in pdf else "vec"])
            return pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "code": list(map(bytes, model.encode_np(X))),
                }
            )

        return _map_codec(df, id_col, vec_col, fn, "id bigint, code binary")

    def decode(self, df: DataFrame, id_col: str = "id", code_col: str = "code") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            codes = np.stack([np.frombuffer(c, np.uint8) for c in pdf[code_col]])
            return pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "vec": list(model.decode_np(codes).astype(np.float32)),
                }
            )

        return _map_codec(df, id_col, code_col, fn, "id bigint, vec array<float>")


class ResidualQuantizer:
    """Estimator: greedy per-level k-means on residuals of the training
    sample (reference ResidualQuantizer::train)."""

    def __init__(
        self, M: int = 4, nbits: int = 8, beam: int = 4, niter: int = 15,
        seed: int = 1234, max_train_points: int = 65536,
    ):
        if nbits != 8:
            raise NotImplementedError("8-bit RQ codes only (ksub=256)")
        self.M = M
        self.ksub = 1 << nbits
        self.beam = beam
        self.niter = niter
        self.seed = seed
        self.max_train_points = max_train_points

    def fit(self, df: DataFrame, vec_col: str = "vec") -> ResidualQuantizerModel:
        X = _sampled_matrix(df, vec_col, self.max_train_points, self.seed)
        d = X.shape[1]
        ksub = min(self.ksub, len(X))
        books = np.empty((self.M, ksub, d), np.float64)
        resid = X.copy()
        for m in range(self.M):
            C, labels = _kmeans_np(resid, ksub, self.niter, self.seed + m)
            books[m] = C
            resid = resid - C[labels]
        return ResidualQuantizerModel(codebooks=books, beam=self.beam)


# ====================================================== LocalSearchQuantizer


@dataclass
class LocalSearchQuantizerModel:
    """LSQ: additive codebooks with ICM (iterated conditional modes)
    encoding (reference faiss/impl/LocalSearchQuantizer.h:45 — we use
    deterministic ICM without the simulated-annealing perturbations, so
    encodings are reproducible; the annealing is a quality knob, not a
    semantic)."""

    codebooks: np.ndarray  # (M, ksub, d)
    icm_iters: int = 3

    @property
    def M(self) -> int:
        return self.codebooks.shape[0]

    def code_size(self) -> int:
        return self.M

    def _icm_encode(self, X: np.ndarray, codes: np.ndarray) -> np.ndarray:
        """Refine codes level-by-level: fix all levels but m, re-pick m."""
        n = len(X)
        recon = np.zeros_like(X)
        for m in range(self.M):
            recon += self.codebooks[m][codes[:, m]]
        for _ in range(self.icm_iters):
            for m in range(self.M):
                recon -= self.codebooks[m][codes[:, m]]
                target = X - recon  # what level m should explain
                C = self.codebooks[m]
                d2 = (
                    (target * target).sum(1)[:, None]
                    + (C * C).sum(1)[None, :]
                    - 2.0 * (target @ C.T)
                )
                codes[:, m] = d2.argmin(1)
                recon += C[codes[:, m]]
        return codes

    def encode_np(self, X: np.ndarray) -> np.ndarray:
        # greedy init (RQ-style) then ICM refinement
        n, d = X.shape
        codes = np.zeros((n, self.M), np.uint8)
        resid = X.copy()
        for m in range(self.M):
            C = self.codebooks[m]
            d2 = (
                (resid * resid).sum(1)[:, None]
                + (C * C).sum(1)[None, :]
                - 2.0 * (resid @ C.T)
            )
            codes[:, m] = d2.argmin(1)
            resid -= C[codes[:, m]]
        return self._icm_encode(X, codes)

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        out = np.zeros((len(codes), self.codebooks.shape[2]), np.float64)
        for m in range(self.M):
            out += self.codebooks[m][codes[:, m]]
        return out

    def encode(self, df: DataFrame, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            X = as_matrix(pdf[vec_col if vec_col in pdf else "vec"])
            return pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "code": list(map(bytes, model.encode_np(X))),
                }
            )

        return _map_codec(df, id_col, vec_col, fn, "id bigint, code binary")

    def decode(self, df: DataFrame, id_col: str = "id", code_col: str = "code") -> DataFrame:
        model = self

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            codes = np.stack([np.frombuffer(c, np.uint8) for c in pdf[code_col]])
            return pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "vec": list(model.decode_np(codes).astype(np.float32)),
                }
            )

        return _map_codec(df, id_col, code_col, fn, "id bigint, vec array<float>")


class LocalSearchQuantizer:
    """Estimator: alternate ICM encoding ↔ least-squares codebook update
    (each codebook entry = mean of the residuals assigned to it)."""

    def __init__(
        self, M: int = 4, nbits: int = 8, train_iters: int = 3,
        icm_iters: int = 3, niter_init: int = 10, seed: int = 1234,
        max_train_points: int = 65536,
    ):
        if nbits != 8:
            raise NotImplementedError("8-bit LSQ codes only")
        self.M = M
        self.ksub = 1 << nbits
        self.train_iters = train_iters
        self.icm_iters = icm_iters
        self.niter_init = niter_init
        self.seed = seed
        self.max_train_points = max_train_points

    def fit(self, df: DataFrame, vec_col: str = "vec") -> LocalSearchQuantizerModel:
        X = _sampled_matrix(df, vec_col, self.max_train_points, self.seed)
        ksub = min(self.ksub, len(X))
        # init codebooks like RQ
        books = np.empty((self.M, ksub, X.shape[1]), np.float64)
        resid = X.copy()
        for m in range(self.M):
            C, labels = _kmeans_np(resid, ksub, self.niter_init, self.seed + m)
            books[m] = C
            resid = resid - C[labels]
        model = LocalSearchQuantizerModel(codebooks=books, icm_iters=self.icm_iters)
        for _ in range(self.train_iters):
            codes = model.encode_np(X)
            # least-squares-ish update: each entry = mean of its residuals
            for m in range(self.M):
                recon_others = model.decode_np(codes) - books[m][codes[:, m]]
                target = X - recon_others
                for kk in range(ksub):
                    mask = codes[:, m] == kk
                    if mask.any():
                        books[m][kk] = target[mask].mean(0)
            model = LocalSearchQuantizerModel(
                codebooks=books, icm_iters=self.icm_iters
            )
        return model


# ================================================== ProductAdditiveQuantizer


class ProductAdditiveQuantizer:
    """Product of additive (residual) quantizers (reference
    faiss/impl/ProductAdditiveQuantizer.h:28): split d into `nsplits`
    groups, each encoded by an independent RQ — combines PQ's dimension
    split with RQ's additive refinement."""

    def __init__(self, nsplits: int = 2, M_per_split: int = 2,
                 niter: int = 10, seed: int = 1234):
        self.nsplits = nsplits
        self.M_per_split = M_per_split
        self.niter = niter
        self.seed = seed

    def fit(self, df: DataFrame, vec_col: str = "vec"):
        from pyspark.sql import functions as _F

        d = df.select(_F.size(vec_col)).first()[0]
        if d % self.nsplits:
            raise ValueError(f"d={d} not divisible by nsplits={self.nsplits}")
        dsub = d // self.nsplits
        subs = []
        for s in range(self.nsplits):
            sub_df = df.select(
                _F.slice(_F.col(vec_col), s * dsub + 1, dsub).alias("vec")
            )
            rq = ResidualQuantizer(
                M=self.M_per_split, niter=self.niter, seed=self.seed + s
            ).fit(sub_df, vec_col="vec")
            subs.append(rq)
        return ProductAdditiveQuantizerModel(subs=subs, dsub=dsub)


@dataclass
class ProductAdditiveQuantizerModel:
    subs: list  # of ResidualQuantizerModel
    dsub: int

    def code_size(self) -> int:
        return sum(s.code_size() for s in self.subs)

    def encode_np(self, X: np.ndarray) -> np.ndarray:
        parts = [
            s.encode_np(X[:, i * self.dsub : (i + 1) * self.dsub])
            for i, s in enumerate(self.subs)
        ]
        return np.concatenate(parts, axis=1)

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        outs = []
        off = 0
        for s in self.subs:
            m = s.code_size()
            outs.append(s.decode_np(codes[:, off : off + m]))
            off += m
        return np.concatenate(outs, axis=1)
