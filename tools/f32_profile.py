"""Profile the f32 exact-kNN scan at the Arrow/numpy boundary
(VERDICT r10 what's-wrong #2 / next-round #6).

`ratio_vs_blas_f32` crept 1.13 (r9) → 1.38-1.45 (r10) across identical
nv/nq/d while `knn.py` / `kernels.py` are byte-identical between the
revisions — so the cost moved INSIDE unchanged code (environment,
allocator, or concurrency interaction), and speculation is useless:
this tool decomposes one executor task's work and the concurrency
profile directly.

Phases measured (single process, per push_block of one partition-sized
block, nq=10k × m=600k/32 × d=64, k=10, L2):
  xnorm   — (X*X).sum(1) per block
  gemm    — the tiled `_compute_block` loop's arithmetic re-run verbatim
            (dgemm/sgemm into the reused workspace + axpy post-ops)
  push    — the real TopKAccumulator.push_block (gemm + tie-safe select)
  roofline— np.dot of the same flops into a preallocated warmed buffer
            (exactly bench._kernel_bench's denominator)

Concurrency sweep: P ∈ {1, 8, 32} worker PROCESSES each running the
single-task gemm loop simultaneously (each pinned to 1 BLAS thread,
like Spark python workers); per-process rate vs P exposes memory-
bandwidth saturation — the one cause that slows 32 concurrent
single-thread sgemms without touching the single-stream roofline.

Usage: python tools/f32_profile.py
Prints one JSON line; findings recorded in SCALE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NQ, M, D, K = 10_000, 600_000 // 32, 64, 10
ITERS = 8


def _mats(dtype):
    import numpy as np

    rng = np.random.default_rng(7)
    Q = np.ascontiguousarray(rng.standard_normal((NQ, D)), dtype)
    X = np.ascontiguousarray(rng.standard_normal((M, D)), dtype)
    return Q, X


def _best(fn, runs=3):
    fn()
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def phases(dtype_name: str) -> dict:
    import numpy as np

    from faiss_spark.kernels import TopKAccumulator, _compute_block, _row_chunk

    dt = np.dtype(np.float32 if dtype_name == "f32" else np.float64)
    Q, X = _mats(dt)
    ids = np.arange(M, dtype=np.int64)
    qn = (Q * Q).sum(1)
    xn = (X * X).sum(1)

    t_xnorm = _best(lambda: (X * X).sum(1)) * ITERS

    chunk = _row_chunk(NQ, M, D, "l2", dt)

    def gemm_loop():
        for r0 in range(0, NQ, chunk):
            _compute_block(Q, X, r0, min(NQ, r0 + chunk), "l2", qn, xn, dt)

    t_gemm = _best(gemm_loop) * ITERS

    def push():
        acc = TopKAccumulator(NQ, K, False)
        acc.bind_queries(Q, "l2")
        for _ in range(ITERS):
            acc.push_block(X, ids)
        return acc

    t_push = _best(push, runs=2)

    out = np.empty((NQ, M), dt)
    np.dot(Q, X.T, out=out)  # warm first-touch

    def roof():
        for _ in range(ITERS):
            np.dot(Q, X.T, out=out)

    t_roof = _best(roof, runs=2)
    flops = 2.0 * NQ * M * D * ITERS
    return {
        "chunk_rows": chunk,
        "xnorm_sec": round(t_xnorm, 4),
        "gemm_loop_sec": round(t_gemm, 4),
        "push_block_sec": round(t_push, 4),
        "select_overhead_sec": round(t_push - t_gemm, 4),
        "roofline_sec": round(t_roof, 4),
        "ratio_gemm_vs_roof": round(t_gemm / t_roof, 3),
        "ratio_push_vs_roof": round(t_push / t_roof, 3),
        "roof_gflops": round(flops / t_roof / 1e9, 1),
    }


ITERS_CONC = 2  # the p32 f64 row alone runs ~3 min at ITERS=8


def _worker(dtype_name: str, iters: int, q: "mp.Queue") -> None:
    os.environ["OPENBLAS_NUM_THREADS"] = "1"
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ["MKL_NUM_THREADS"] = "1"
    import numpy as np

    dt = np.dtype(np.float32 if dtype_name == "f32" else np.float64)
    Q, X = _mats(dt)
    out = np.empty((NQ, M), dt)
    np.dot(Q, X.T, out=out)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.dot(Q, X.T, out=out)
    q.put(time.perf_counter() - t0)


def concurrency(dtype_name: str) -> dict:
    flops1 = 2.0 * NQ * M * D * ITERS_CONC
    res = {}
    for p in (1, 8, 32):
        q: mp.Queue = mp.Queue()
        procs = [
            mp.Process(target=_worker, args=(dtype_name, ITERS_CONC, q))
            for _ in range(p)
        ]
        t0 = time.perf_counter()
        for pr in procs:
            pr.start()
        times = [q.get() for _ in procs]
        for pr in procs:
            pr.join()
        wall = time.perf_counter() - t0
        res[f"p{p}"] = {
            "wall_sec": round(wall, 3),
            "per_proc_med_sec": round(sorted(times)[len(times) // 2], 3),
            "agg_gflops": round(p * flops1 / wall / 1e9, 1),
        }
    return res


def main() -> None:
    out = {"nq": NQ, "m": M, "d": D, "iters": ITERS, "iters_conc": ITERS_CONC}
    if "--conc-only" not in sys.argv:
        for dt in ("f64", "f32"):
            out[dt] = phases(dt)
            print(f"# phases {dt}: {out[dt]}", file=sys.stderr)
    for dt in ("f64", "f32"):
        out[f"conc_{dt}"] = concurrency(dt)
        print(f"# concurrency {dt}: {out[f'conc_{dt}']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
