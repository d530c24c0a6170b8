"""Single-shard profile of the NSG search scan: what does one probed
shard's task spend on — adjacency assembly, beam search rounds, emit?
Pure numpy (no Spark), replicating the scan closure's work on one
bench-shaped shard. Working evidence for OPTIMIZATION_r13.md.

Usage: python tools/nsg_search_profile.py [shard_rows] [nq_per_shard]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from faiss_spark.operators.nsg import _beam_search_all, _build_shard_graph


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    d, R, knn_k, k, L = 64, 16, 24, 10, 48
    rng = np.random.default_rng(7)
    X = (rng.random((n, d), dtype=np.float64) - 0.5)
    Q = (rng.random((nq, d), dtype=np.float64) - 0.5)

    t0 = time.perf_counter()
    adj_list, ep = _build_shard_graph(X, R=R, knn_k=knn_k)
    t_build = time.perf_counter() - t0
    W = max(len(a) for a in adj_list)
    adj = np.full((n, W), -1, np.int64)
    for i, a in enumerate(adj_list):
        adj[i, : len(a)] = a

    # warm + timed beam search
    _beam_search_all(X, adj, ep, Q[:64], k, L)
    t0 = time.perf_counter()
    nid, nd = _beam_search_all(X, adj, ep, Q, k, L)
    t_search = time.perf_counter() - t0

    # instrumented round count + per-phase split (re-run with counters)
    rounds = 0
    nqv = len(Q)
    L_ = max(L, k)
    Xf = X
    Xpad = np.vstack([Xf, np.zeros((1, d), Xf.dtype)])
    pool_ids = np.full((nqv, L_), -1, np.int64)
    pool_d = np.full((nqv, L_), np.inf)
    expanded = np.zeros((nqv, L_), bool)
    visited = np.zeros((nqv, n + 1), bool)
    visited[:, ep] = True
    pool_ids[:, 0] = ep
    pool_d[:, 0] = ((Q - Xf[ep]) ** 2).sum(1)
    qsq = (Q * Q).sum(1)
    xsq = np.append((Xf * Xf).sum(1), 0.0)
    rows_all = np.arange(nqv)
    t_sel = t_gather = t_merge = 0.0
    na_hist = []
    while True:
        ts = time.perf_counter()
        unexp = (~expanded) & (pool_ids >= 0) & np.isfinite(pool_d)
        act = unexp.any(1)
        if not act.any():
            break
        qact = rows_all[act]
        slots = unexp[act].argmax(1)
        expanded[qact, slots] = True
        u = pool_ids[qact, slots]
        V = adj[u]
        valid = V >= 0
        Vc = np.where(valid, V, n)
        fresh = valid & ~visited[qact[:, None], Vc]
        visited[qact[:, None], Vc] = True
        t_sel += time.perf_counter() - ts
        if not fresh.any():
            rounds += 1
            continue
        tg = time.perf_counter()
        dmat = (
            qsq[qact][:, None]
            + xsq[Vc]
            - 2.0 * np.einsum("ad,awd->aw", Q[qact], Xpad[Vc])
        )
        dmat[~fresh] = np.inf
        Vm = np.where(fresh, V, -1)
        t_gather += time.perf_counter() - tg
        tm = time.perf_counter()
        ids2 = np.concatenate([pool_ids[qact], Vm], axis=1)
        d2 = np.concatenate([pool_d[qact], dmat], axis=1)
        ex2 = np.concatenate(
            [expanded[qact], np.zeros((len(qact), adj.shape[1]), bool)], axis=1
        )
        order = np.argsort(d2, axis=1, kind="stable")[:, :L_]
        pool_ids[qact] = np.take_along_axis(ids2, order, 1)
        pool_d[qact] = np.take_along_axis(d2, order, 1)
        expanded[qact] = np.take_along_axis(ex2, order, 1)
        t_merge += time.perf_counter() - tm
        rounds += 1
        na_hist.append(len(qact))
    print(
        f"shard n={n} nq={nq} W={W}: build={t_build:.2f}s "
        f"search={t_search:.2f}s rounds={rounds} "
        f"sel={t_sel:.2f} gather={t_gather:.2f} merge={t_merge:.2f} "
        f"na_mean={np.mean(na_hist):.0f} na_last10={na_hist[-10:]}"
    )


if __name__ == "__main__":
    main()
