"""Numpy distance/top-k kernels used inside Arrow-batched Pandas UDFs.

These mirror the faiss brute-force BLAS path (reference
faiss/utils/distances.cpp:271-354 ``exhaustive_L2sqr_blas``: tiled GEMM of
``-2 X Qᵀ`` plus row norms) and the bounded-heap accumulation
(faiss/utils/Heap.h, faiss/impl/ResultHandler.h). On Spark the tiling is
the Arrow record batch; the per-partition heap is a running (nq, k)
candidate set merged with ``np.argpartition`` — O(n) per batch, no sort.

All distance math is float64 so results hash-match a SQL double oracle;
the GEMM still runs through BLAS (dgemm), which at d≈64-1024 is far from
the bottleneck relative to shuffle/scan at scale.

Metric conventions follow faiss (reference faiss/MetricType.h:23-33):
  l2      -> squared L2, smaller is better (faiss returns squared L2)
  ip      -> inner product, larger is better
  cosine  -> cosine similarity, larger is better
  l1/linf -> smaller is better
"""

from __future__ import annotations

import numpy as np

#: metrics where larger values are better (similarities)
SIMILARITY_METRICS = frozenset({"ip", "cosine"})
METRICS = frozenset(
    {"l2", "ip", "cosine", "l1", "linf", "canberra", "braycurtis", "jensenshannon"}
)


def as_matrix(col) -> np.ndarray:
    """Stack a pandas Series / list of array<float> into (n, d) float64."""
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.asarray(np.stack(col), dtype=np.float64)


def pairwise_distances(Q: np.ndarray, X: np.ndarray, metric: str) -> np.ndarray:
    """Dense (nq, nx) distance/similarity matrix, float64.

    l2 follows faiss and returns *squared* L2 (reference
    faiss/utils/distances.h:232 ``knn_L2sqr``).
    """
    if metric == "l2":
        if Q.shape[1] <= 16:
            # small d: direct Σ(q−x)² — bit-identical to the SQL oracle's
            # sequential sum, which matters because low-d/discrete data has
            # EXACT distance ties and the GEMM decomposition perturbs
            # mathematically-equal values by ~1e-14, reordering ties.
            # Dimension-at-a-time with REUSED buffers: a broadcast 3-D temp
            # would allocate nq×m×d×8 bytes per batch, and that churn
            # drives kernel memory-reclaim storms on big scans.
            nq, m = Q.shape[0], X.shape[0]
            d2 = np.zeros((nq, m), dtype=np.float64)
            buf = np.empty((nq, m), dtype=np.float64)
            for j in range(Q.shape[1]):
                np.subtract.outer(Q[:, j], X[:, j], out=buf)
                buf *= buf
                d2 += buf
            return d2
        # ||q||^2 + ||x||^2 - 2 q.x  (same decomposition as the reference
        # BLAS path, faiss/utils/distances.cpp:271)
        d2 = (
            (Q * Q).sum(axis=1)[:, None]
            + (X * X).sum(axis=1)[None, :]
            - 2.0 * (Q @ X.T)
        )
        np.maximum(d2, 0.0, out=d2)
        return d2
    if metric == "ip":
        return Q @ X.T
    if metric == "cosine":
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        xn = np.linalg.norm(X, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        xn[xn == 0] = 1.0
        return (Q / qn) @ (X / xn).T
    if metric == "l1":
        return np.abs(Q[:, None, :] - X[None, :, :]).sum(axis=2)
    if metric == "linf":
        return np.abs(Q[:, None, :] - X[None, :, :]).max(axis=2)
    # extra metrics (reference faiss/utils/extra_distances.h:23-48,
    # faiss/MetricType.h:23-33) — pairwise elementwise forms
    if metric == "canberra":
        num = np.abs(Q[:, None, :] - X[None, :, :])
        den = np.abs(Q)[:, None, :] + np.abs(X)[None, :, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(den > 0, num / den, 0.0)
        return frac.sum(axis=2)
    if metric == "braycurtis":
        num = np.abs(Q[:, None, :] - X[None, :, :]).sum(axis=2)
        den = np.abs(Q[:, None, :] + X[None, :, :]).sum(axis=2)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(den > 0, num / den, 0.0)
    if metric == "jensenshannon":
        # faiss convention (extra_distances-inl.h KLD form): accumulate
        # x·log(2x/(x+y)) + y·log(2y/(x+y)) over components with guards
        Qe = Q[:, None, :]
        Xe = X[None, :, :]
        s = Qe + Xe
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = np.where(Qe > 0, Qe * np.log(np.where(s > 0, 2 * Qe / s, 1.0)), 0.0)
            t2 = np.where(Xe > 0, Xe * np.log(np.where(s > 0, 2 * Xe / s, 1.0)), 0.0)
        return (t1 + t2).sum(axis=2)
    raise ValueError(f"unknown metric {metric!r}; expected one of {sorted(METRICS)}")


class TopKAccumulator:
    """Running per-query top-k over a stream of candidate blocks.

    Spark-side equivalent of faiss's ``ResultHeap`` partial/final merge
    (reference faiss/python/extra_wrappers.py:136-174): each Arrow batch
    contributes (nq, block) distances; we keep the best k per query with
    ``np.argpartition`` (O(n), no full sort) and tie-break (dist, id)
    deterministically at emit time.
    """

    def __init__(self, nq: int, k: int, largest: bool):
        self.nq = nq
        self.k = k
        self.largest = largest
        self.dist = np.empty((nq, 0), dtype=np.float64)
        self.ids = np.empty((nq, 0), dtype=np.int64)

    def push(self, block_dist: np.ndarray, block_ids: np.ndarray) -> None:
        """block_dist: (nq, m); block_ids: (m,)"""
        m = block_dist.shape[1]
        k = self.k
        if m > 4 * k:
            # pre-reduce the batch with O(m) argpartition — but tie-SAFE:
            # keep at least every entry whose key ≤ the per-row kth
            # smallest, so equal-distance candidates with smaller ids can
            # never be dropped before the lexicographic shrink
            key = -block_dist if self.largest else block_dist
            kth = np.partition(key, min(k, m) - 1, axis=1)[:, min(k, m) - 1 : min(k, m)]
            need = int((key <= kth).sum(axis=1).max())
            w = min(m, max(need, k))
            if w < m:
                part = np.argpartition(key, w - 1, axis=1)[:, :w]
                block_dist = np.take_along_axis(block_dist, part, axis=1)
                ids = block_ids[part]
            else:
                ids = np.broadcast_to(block_ids[None, :], block_dist.shape)
        else:
            ids = np.broadcast_to(block_ids[None, :], block_dist.shape)
        self.dist = np.concatenate([self.dist, block_dist], axis=1)
        self.ids = np.concatenate([self.ids, ids], axis=1)
        if self.dist.shape[1] > 8 * self.k:
            self._shrink()

    def _shrink(self) -> None:
        m = self.dist.shape[1]
        if m <= self.k:
            return
        key = -self.dist if self.largest else self.dist
        # tie-aware truncation: rows with equal dist at the k boundary must
        # keep the SMALLEST ids (ORDER BY dist, id semantics) — a plain
        # argpartition on dist would keep an arbitrary tie subset and the
        # dropped candidate can't be recovered at the final merge
        idx_by_id = np.argsort(self.ids, axis=1, kind="stable")
        k_sorted = np.take_along_axis(key, idx_by_id, axis=1)
        idx_by_key = np.argsort(k_sorted, axis=1, kind="stable")[:, : self.k]
        sel = np.take_along_axis(idx_by_id, idx_by_key, axis=1)
        self.dist = np.take_along_axis(self.dist, sel, axis=1)
        self.ids = np.take_along_axis(self.ids, sel, axis=1)

    def emit(self):
        """Return (qidx, id, dist) 1-D arrays of the final per-query top-k,
        sorted by (dist, id) within each query (ascending for distances,
        descending dist for similarities — id ascending always)."""
        self._shrink()
        nq, m = self.dist.shape
        if m == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
        # per-row lexsort: sort by id first (stable), then by key (stable)
        # => deterministic (dist, id) tie-break, matching ORDER BY dist, id
        idx_by_id = np.argsort(self.ids, axis=1, kind="stable")
        d_sorted = np.take_along_axis(self.dist, idx_by_id, axis=1)
        i_sorted = np.take_along_axis(self.ids, idx_by_id, axis=1)
        k_sorted = -d_sorted if self.largest else d_sorted
        idx_by_key = np.argsort(k_sorted, axis=1, kind="stable")
        d_final = np.take_along_axis(d_sorted, idx_by_key, axis=1)[:, : self.k]
        i_final = np.take_along_axis(i_sorted, idx_by_key, axis=1)[:, : self.k]
        kk = d_final.shape[1]
        qidx = np.repeat(np.arange(nq, dtype=np.int64), kk)
        return qidx, i_final.ravel(), d_final.ravel()


def topk_merge(dist: np.ndarray, ids: np.ndarray, k: int, largest: bool):
    """One-shot top-k of a (nq, m) block; returns (nq, k') dist/id arrays
    sorted with (dist, id) tie-break."""
    acc = TopKAccumulator(dist.shape[0], k, largest)
    acc.push(dist, ids) if ids.ndim == 1 else None
    if ids.ndim == 2:
        acc.dist = dist.astype(np.float64, copy=False)
        acc.ids = ids.astype(np.int64, copy=False)
    return acc.emit()
