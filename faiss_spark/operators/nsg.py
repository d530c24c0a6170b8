"""Batch NSG: sharded navigating-spreading-out graphs with beam search.

Reference: faiss/IndexNSG.h, faiss/impl/NSG.h:99-196 and NSG.cpp —
``init_graph`` (seed from a k-NN graph; the reference builds it with
NN-Descent, IndexNSG.cpp build), ``sync_prune`` (MRNG edge selection,
NSG.cpp:406-460), ``add_reverse_links`` (NSG.cpp:462), ``tree_grow``
(connectivity repair toward the navigating node), ``search_on_graph``
(pool-of-L beam search from the enterpoint).

Spark-first design — the reference's single-machine graph is re-expressed
as SHARDED graphs (the IndexShards composition SURVEY §2.B already uses
for flat search):

* build: vectors are hash-sharded; each shard builds its own NSG in one
  map task (local exact k-NN over the shard, MRNG prune, reverse links,
  BFS connectivity repair to the shard medoid). No cross-shard edges, so
  build is embarrassingly parallel and a 1000-executor cluster builds
  1000 shards concurrently — the Deep1B recipe of sharded graph serving.
* storage: one co-partitioned table (shard, id, vec, neighbors) — the
  adjacency IS a column, partition pruning and predicate pushdown apply.
* search: queries broadcast; every shard runs the reference beam search
  VECTORIZED across all queries at once (per-step gather of each query's
  best unexpanded node, one batched distance evaluation per step);
  per-shard top-k partials merge through the same window as knn. Result
  quality matches a monolithic graph of the same parameters because every
  shard is searched (fan-out = nshards, like IndexShards), while graph
  diameter shrinks with shard size.

Out of scope (COVERAGE §2.B): HNSW's insertion-time level hierarchy — an
ONLINE accelerant for picking entry points; batch shards make the medoid
entry + beam search recover the same search semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, Window

from faiss_spark.kernels import as_matrix


def _local_knn(X: np.ndarray, k: int, tile: int = 1024) -> tuple[np.ndarray, np.ndarray]:
    """Exact k-NN (ids, dists) within a shard — tiled GEMM, excludes
    self. Tile bounds the O(tile·n) scratch so a 100k-row shard stays a
    few hundred MB per task."""
    n = len(X)
    k = min(k, n - 1)
    sq = (X * X).sum(1)
    out = np.empty((n, k), np.int64)
    outd = np.empty((n, k))
    for s in range(0, n, tile):
        e = min(s + tile, n)
        D = sq[s:e, None] + sq[None, :] - 2.0 * (X[s:e] @ X.T)
        D[np.arange(e - s), np.arange(s, e)] = np.inf
        part = np.argpartition(D, k - 1, axis=1)[:, :k]
        rows = np.arange(e - s)[:, None]
        order = np.argsort(D[rows, part], axis=1, kind="stable")
        out[s:e] = part[rows, order]
        outd[s:e] = D[rows, part[rows, order]]
    np.maximum(outd, 0.0, out=outd)
    return out, outd


def _mrng_prune_one(
    X: np.ndarray, self_id: int, ids: np.ndarray, dq: np.ndarray, R: int
) -> np.ndarray:
    """sync_prune for one node (reference NSG.cpp:406-460): keep the
    closest candidate, then each further candidate p only if no
    already-kept t occludes it (d(t, p) < d(q, p)); cap degree at R.
    ids/dq sorted by distance ascending."""
    kept: list[int] = []
    kept_vecs: list[np.ndarray] = []
    for j in range(len(ids)):
        p = int(ids[j])
        if p == self_id or p < 0 or p in kept:
            continue
        if not kept:
            kept.append(p)
            kept_vecs.append(X[p])
            continue
        if len(kept) >= R:
            break
        T = np.asarray(kept_vecs)
        djk = ((T - X[p]) ** 2).sum(1)
        if np.any(djk < dq[j]):
            continue
        kept.append(p)
        kept_vecs.append(X[p])
    return np.asarray(kept, np.int64)


def _build_shard_graph(
    X: np.ndarray, R: int, knn_k: int
) -> tuple[np.ndarray, int]:
    """Build one shard's NSG adjacency: local k-NN → MRNG prune →
    reverse links (re-pruned to R) → BFS connectivity repair to the
    medoid (reference link + add_reverse_links + tree_grow). Returns
    (adjacency (n, R) int64 with -1 padding, enterpoint index)."""
    n = len(X)
    if n == 1:
        return np.full((1, R), -1, np.int64), 0
    nn, d_nn = _local_knn(X, knn_k)  # (n, k) sorted ascending
    kept = [_mrng_prune_one(X, q, nn[q], d_nn[q], R) for q in range(n)]
    # reverse links (add_reverse_links): append q to each neighbor's list
    adj: list[set] = [set(map(int, k)) for k in kept]
    for q in range(n):
        for p in kept[q]:
            adj[int(p)].add(q)
    # cap degree: re-prune oversized lists with the same MRNG rule
    for q in range(n):
        if len(adj[q]) > R:
            ids = np.fromiter(adj[q], np.int64, len(adj[q]))
            d = ((X[ids] - X[q]) ** 2).sum(1)
            order = np.argsort(d, kind="stable")
            pruned = _mrng_prune_one(X, q, ids[order], d[order], R)
            adj[q] = set(map(int, pruned))
    # enterpoint = medoid (closest to centroid), then BFS repair
    centroid = X.mean(0)
    ep = int(((X - centroid) ** 2).sum(1).argmin())
    seen = np.zeros(n, bool)
    stack = [ep]
    seen[ep] = True
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if not seen[v]:
                seen[v] = True
                stack.append(v)
    unreached = np.where(~seen)[0]
    if len(unreached):
        reached = np.where(seen)[0]
        # attach each unreached node from its nearest reached node
        # (tree_grow's attach-to-closest-visited, NSG.cpp tree_grow)
        for u in unreached:
            d = ((X[reached] - X[u]) ** 2).sum(1)
            adj[int(reached[d.argmin()])].add(int(u))
    # width = actual max degree (connectivity repair may push a few
    # nodes past R — the reference tolerates this the same way)
    width = max(R, max((len(s) for s in adj), default=R))
    out = np.full((n, width), -1, np.int64)
    for q in range(n):
        if adj[q]:
            ids = np.fromiter(adj[q], np.int64, len(adj[q]))
            out[q, : len(ids)] = ids
    return out, ep


def _beam_search_all(
    X: np.ndarray,
    adj: np.ndarray,
    ep: int,
    Q: np.ndarray,
    k: int,
    search_L: int,
) -> tuple[np.ndarray, np.ndarray]:
    """search_on_graph (NSG.cpp) vectorized across queries: every query
    keeps a pool of search_L best-so-far; each step expands its best
    unexpanded node; one batched distance evaluation per step. Returns
    (ids (nq, k), dists (nq, k)) with -1 padding."""
    nq = len(Q)
    n, R1 = adj.shape
    L = max(search_L, k)
    INF = np.inf
    pool_ids = np.full((nq, L), -1, np.int64)
    pool_d = np.full((nq, L), INF)
    expanded = np.zeros((nq, L), bool)
    visited = [set((int(ep),)) for _ in range(nq)]
    d0 = ((Q - X[ep]) ** 2).sum(1)
    pool_ids[:, 0] = ep
    pool_d[:, 0] = d0
    qsq = (Q * Q).sum(1)
    xsq = (X * X).sum(1)
    active = np.ones(nq, bool)
    while active.any():
        # per active query: first unexpanded pool slot
        for qi in np.where(active)[0]:
            unexp = np.where((~expanded[qi]) & (pool_ids[qi] >= 0))[0]
            if len(unexp) == 0:
                active[qi] = False
                continue
            slot = unexp[0]
            expanded[qi, slot] = True
            u = int(pool_ids[qi, slot])
            nbrs = adj[u]
            nbrs = nbrs[nbrs >= 0]
            fresh = [v for v in nbrs if v not in visited[qi]]
            if not fresh:
                continue
            visited[qi].update(int(v) for v in fresh)
            V = np.asarray(fresh, np.int64)
            d = qsq[qi] + xsq[V] - 2.0 * (X[V] @ Q[qi])
            # merge into the pool: concatenate + stable resort to L
            ids2 = np.concatenate([pool_ids[qi], V])
            d2 = np.concatenate([pool_d[qi], d])
            ex2 = np.concatenate([expanded[qi], np.zeros(len(V), bool)])
            order = np.argsort(d2, kind="stable")[:L]
            pool_ids[qi] = ids2[order]
            pool_d[qi] = d2[order]
            expanded[qi] = ex2[order]
    return pool_ids[:, :k], pool_d[:, :k]


@dataclass
class NSGIndex:
    """Sharded batch NSG (reference IndexNSG re-expressed per SURVEY
    §2.B shards composition). ``table`` holds (shard, id, vec, neighbors,
    is_ep) co-partitioned by shard.

    Two sharding modes:

    * ``"hash"`` — uniform shards; every shard is searched (IndexShards
      fan-out). Best recall, cost grows with nshards.
    * ``"cells"`` — shards are k-means cells (``centroids`` kept on the
      index) and ``search(nprobe=...)`` routes each query to its nprobe
      nearest cells only. The scan's ``isin(probed)`` filter prunes
      parquet PARTITIONS, so a 1000-shard corpus reads nprobe/1000 of
      its bytes per query batch — the SPANN / Deep1B serving shape
      (graph-per-cell + centroid routing) rather than all-shard fan-out.
    """

    table: DataFrame
    nshards: int
    R: int
    centroids: np.ndarray | None = None  # (nshards, d) for cell sharding

    @staticmethod
    def build(
        vectors: DataFrame,
        R: int = 16,
        knn_k: int = 32,
        nshards: int = 4,
        sharding: str = "hash",
        id_col: str = "id",
        vec_col: str = "vec",
        seed: int = 1234,
    ) -> "NSGIndex":
        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        centroids = None
        if sharding == "cells":
            from faiss_spark.operators.cluster import KMeans

            km = KMeans(k=nshards, niter=10, seed=seed).fit(src, vec_col="vec")
            centroids = km.centroids
            src = km.assign(src, vec_col="vec", keep_vec=True).select(
                "id", "vec", F.col("cluster").cast("int").alias("shard")
            )
        elif sharding == "hash":
            src = src.withColumn(
                "shard", (F.crc32(F.col("id").cast("string")) % nshards).cast("int")
            )
        else:
            raise ValueError(f"sharding must be 'hash' or 'cells', got {sharding!r}")
        R_, knn_k_ = R, knn_k

        def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            X = as_matrix(pdf["vec"])
            ids = pdf["id"].to_numpy(np.int64)
            adj, ep = _build_shard_graph(X, R_, knn_k_)
            neigh = [
                [int(ids[v]) for v in row if v >= 0] for row in adj
            ]
            return pd.DataFrame(
                {
                    "shard": pdf["shard"],
                    "id": ids,
                    "vec": pdf["vec"],
                    "neighbors": neigh,
                    "is_ep": np.arange(len(ids)) == ep,
                }
            )

        table = src.repartition(nshards, "shard").groupBy("shard").applyInPandas(
            build_shard,
            schema="shard int, id bigint, vec array<float>, "
            "neighbors array<bigint>, is_ep boolean",
        )
        return NSGIndex(table=table, nshards=nshards, R=R, centroids=centroids)

    def save(self, path: str) -> "NSGIndex":
        spark = self.table.sparkSession
        self.table.repartition("shard").write.mode("overwrite").partitionBy(
            "shard"
        ).parquet(path)
        self.table = spark.read.parquet(path)
        if self.centroids is not None:
            cpdf = pd.DataFrame(
                {
                    "shard": np.arange(len(self.centroids), dtype=np.int32),
                    "vec": list(self.centroids.astype(np.float32)),
                }
            )
            spark.createDataFrame(cpdf).write.mode("overwrite").parquet(
                path + "_centroids"
            )
        return self

    @staticmethod
    def load(spark: SparkSession, path: str, R: int = 16) -> "NSGIndex":
        t = spark.read.parquet(path)
        nshards = t.select("shard").distinct().count()
        centroids = None
        try:
            cp = spark.read.parquet(path + "_centroids").toPandas()
            cp = cp.sort_values("shard")
            centroids = as_matrix(cp["vec"])
        except Exception:
            pass
        return NSGIndex(table=t, nshards=nshards, R=R, centroids=centroids)

    def search(
        self,
        queries: DataFrame,
        k: int,
        search_L: int = 32,
        nprobe: int | None = None,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        """Beam search per shard, merged (IndexShards semantics);
        search_L is the reference's pool length (NSG.h:114 search_L).

        nprobe (cell-sharded indexes only): route each query to its
        nprobe nearest cell shards; unprobed shards are pruned from the
        scan entirely. None = search every shard."""
        spark = self.table.sparkSession
        qpdf = queries.select(qid_col, qvec_col).toPandas()
        qids = qpdf[qid_col].to_numpy(np.int64)
        Q = as_matrix(qpdf[qvec_col])
        shard2q = None
        src = self.table
        if nprobe is not None:
            if self.centroids is None:
                raise ValueError("nprobe routing needs a cell-sharded index")
            nprobe = min(nprobe, self.nshards)
            C = self.centroids
            CD = (
                (Q * Q).sum(1)[:, None]
                + (C * C).sum(1)[None, :]
                - 2.0 * (Q @ C.T)
            )
            probes = np.argsort(CD, axis=1, kind="stable")[:, :nprobe]
            probed = sorted({int(s) for s in probes.ravel()})
            shard2q = {s: [] for s in probed}
            for qi in range(len(qids)):
                for s in probes[qi]:
                    shard2q[int(s)].append(qi)
            shard2q = {s: np.asarray(v, np.int64) for s, v in shard2q.items()}
            src = src.filter(F.col("shard").isin(probed))
        bc = spark.sparkContext.broadcast((qids, Q, shard2q))
        k_, L_ = k, search_L

        def scan(key, pdf: pd.DataFrame) -> pd.DataFrame:
            qids_all, Q_all, s2q = bc.value
            shard = int(key[0])
            if s2q is not None:
                qsel = s2q.get(shard)
                if qsel is None or len(qsel) == 0:
                    return pd.DataFrame(
                        {"qid": [], "id": [], "dist": []}
                    ).astype({"qid": "int64", "id": "int64", "dist": "float64"})
                qids_, Q_ = qids_all[qsel], Q_all[qsel]
            else:
                qids_, Q_ = qids_all, Q_all
            ids = pdf["id"].to_numpy(np.int64)
            X = as_matrix(pdf["vec"])
            id2ix = {int(g): i for i, g in enumerate(ids)}
            n = len(ids)
            width = max((len(nb) for nb in pdf["neighbors"]), default=1)
            adj = np.full((n, max(width, 1)), -1, np.int64)
            for i, nb in enumerate(pdf["neighbors"]):
                loc = [id2ix[int(v)] for v in nb if int(v) in id2ix]
                adj[i, : len(loc)] = loc
            eps = np.where(pdf["is_ep"].to_numpy(bool))[0]
            ep = int(eps[0]) if len(eps) else 0
            nid, nd = _beam_search_all(X, adj, ep, Q_, k_, L_)
            rows = []
            for qi in range(len(qids_)):
                mask = nid[qi] >= 0
                rows.append(
                    pd.DataFrame(
                        {
                            "qid": qids_[qi],
                            "id": ids[nid[qi][mask]],
                            "dist": nd[qi][mask],
                        }
                    )
                )
            return pd.concat(rows, ignore_index=True)

        cands = src.groupBy("shard").applyInPandas(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )
