"""Index maintenance + profiling + autotune — SURVEY §2.A thin verbs,
§2.C MatrixStats, §2.H two-level clustering, §2.J ParameterSpace.

These are deliberately thin: on Spark an index is an immutable partitioned
table, so the reference's mutating verbs become plain relational rewrites
(faiss/Index.h:162-167 reset/remove_ids, :277 merge_from, :175-209
reconstruct*).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faiss_spark.operators.cluster import KMeans, KMeansModel
from faiss_spark.operators.ivf import IVFIndex


# --------------------------------------------------------- §2.A thin verbs


def remove_ids(index: IVFIndex, predicate: Column) -> IVFIndex:
    """remove_ids(IDSelector&) (faiss/Index.h:167): anti-filter rewrite of
    the codes table. The predicate is any Catalyst boolean expression on
    `id` — every IDSelector variant (§2.G) is one of these."""
    index.codes = index.codes.filter(~predicate)
    return index


def merge_from(dst: IVFIndex, src: IVFIndex, add_id: int = 0) -> IVFIndex:
    """merge_from(other, add_id) (faiss/Index.h:277): requires compatible
    models (same quantizer ⇒ same list_no space), mirrors
    check_compatible_for_merge (faiss/Index.h:279-281). Indexes with an
    additive coarse (centroids is None, coarse_q holds the codebooks —
    r11) compare the RCQ/LSQ codebooks instead: np.array_equal(None,
    None) is vacuously True, which would silently merge two different
    virtual-cell spaces."""
    dcq = getattr(dst, "coarse_q", None)
    scq = getattr(src, "coarse_q", None)
    if (dcq is None) != (scq is None):
        raise ValueError(
            "merge_from: incompatible indexes (k-means vs additive "
            "coarse quantizer)"
        )
    if dcq is not None:
        compatible = np.array_equal(dcq.codebooks, scq.codebooks) and (
            dcq.nbits_list == scq.nbits_list
        )
    else:
        compatible = (
            dst.centroids is not None
            and src.centroids is not None
            and np.array_equal(dst.centroids, src.centroids)
        )
    if not compatible:
        raise ValueError("merge_from: incompatible indexes (different coarse quantizers)")
    other = src.codes
    if add_id:
        other = other.withColumn("id", F.col("id") + F.lit(add_id))
    dst.codes = dst.codes.unionByName(other)
    return dst


def reconstruct_batch(index: IVFIndex, ids: list[int]) -> DataFrame:
    """reconstruct_batch (faiss/Index.h:184): join on id. IVFFlat stores
    raw vectors so reconstruction is exact; codec-backed tables decode."""
    return index.codes.filter(F.col("id").isin(ids)).select("id", "vec")


# --------------------------------------------------------- §2.C MatrixStats


def matrix_stats(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Per-dimension profiling (reference MatrixStats, faiss/MatrixStats.h:24):
    (pos, mean, std, min, max, n_zero). One posexplode + agg — map-side
    partials, single shuffle on the 64-value key."""
    x = F.col("x").cast("double")
    return (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.avg(x).alias("mean"),
            F.stddev_pop(x).alias("std"),
            F.min(x).alias("min"),
            F.max(x).alias("max"),
            F.sum(F.when(x == 0.0, 1).otherwise(0)).alias("n_zero"),
        )
        .orderBy("pos")
    )


# ------------------------------------------------- §2.H two-level clustering


def two_level_clustering(
    vectors: DataFrame,
    k1: int,
    k2: int,
    vec_col: str = "vec",
    id_col: str = "id",
    seed: int = 1234,
    niter: int = 10,
) -> tuple[np.ndarray, DataFrame]:
    """Cluster to k1 coarse cells, then k2 sub-clusters within each cell —
    O(n·(k1+k2)) instead of O(n·k1·k2) train cost (reference
    contrib/clustering.py:24 two_level_clustering).

    Returns (centroids (k1*k2', d), assignment DataFrame(id, cluster))."""
    km1 = KMeans(k=k1, niter=niter, seed=seed).fit(vectors, vec_col=vec_col)
    assigned = km1.assign(vectors, vec_col=vec_col, id_col=id_col).select(
        "id", F.col("cluster").alias("c1")
    )
    joined = vectors.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
    ).join(assigned, "id")
    all_centroids = []
    for c1 in range(k1):
        sub = joined.filter(F.col("c1") == c1)
        n_sub = sub.count()
        if n_sub == 0:
            continue
        km2 = KMeans(k=min(k2, n_sub), niter=niter, seed=seed + 1 + c1).fit(
            sub, vec_col="vec"
        )
        all_centroids.append(km2.centroids)
    C = np.vstack(all_centroids)
    final = KMeansModel(centroids=C, k=len(C), d=C.shape[1])
    return C, final.assign(
        vectors.select(F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec"))
    )


# ------------------------------------------------ §2.J ParameterSpace sweep


@dataclass
class OperatingPoint:
    """(perf, time) point (reference AutoTune.h:87 OperatingPoint)."""

    params: dict
    recall: float
    time_sec: float
    pareto: bool = False


def parameter_sweep(
    index: IVFIndex,
    queries: DataFrame,
    truth: DataFrame,
    k: int,
    nprobes: list[int],
    max_codes: list[int | None] | None = None,
    polysemous_hts: list[int | None] | None = None,
) -> list[OperatingPoint]:
    """Sweep nprobe × max_codes (the scan-budget axis the reference's
    ParameterSpace exposes as "max_codes") × polysemous_ht (the Hamming
    pre-filter axis — AutoTune.cpp set_index_parameter handles all
    three), measure recall-vs-exact and wall time, mark the
    Pareto-optimal points (reference ParameterSpace::explore,
    faiss/AutoTune.cpp; OperatingPoints frontier AutoTune.h:87-125).

    With all three axes on an IMIPQ index this reproduces the
    reference's published SIFT1B operating point ("IMI2x12,PQ16,
    nprobe=16, max_codes=10000, ht=48", benchs/README.md:122) as a sweep
    row instead of a single hand-picked config. Indexes whose search()
    takes the knobs directly (IMIPQIndex, IVFPQIndex for ht) are called
    directly; a bare IVFIndex budget sweep routes through
    search_with_parameters as before."""
    import inspect

    from faiss_spark.functions.evaluation import knn_intersection_measure
    from faiss_spark.operators.ivf import search_with_parameters

    sig = inspect.signature(index.search).parameters
    points: list[OperatingPoint] = []
    for np_ in nprobes:
        for mc in max_codes or [None]:
            for ht in polysemous_hts or [None]:
                kw = {}
                if mc is not None:
                    kw["max_codes"] = mc
                if ht is not None:
                    kw["polysemous_ht"] = ht
                t0 = time.perf_counter()
                if all(key in sig for key in kw):
                    res = index.search(queries, k, nprobe=np_, **kw)
                elif set(kw) == {"max_codes"}:
                    res, _ = search_with_parameters(
                        index, queries, k, nprobe=np_, max_codes=mc
                    )
                else:
                    raise ValueError(
                        f"{type(index).__name__}.search does not take "
                        f"{sorted(kw)} and no fallback covers them"
                    )
                res.count()  # materialize
                dt = time.perf_counter() - t0
                rec = knn_intersection_measure(res, truth, k)
                params = {"nprobe": np_}
                params.update(kw)
                points.append(OperatingPoint(params, rec, dt))
    # Pareto: no other point has (recall ≥, time ≤) with one strict
    for p in points:
        p.pareto = not any(
            (q.recall >= p.recall and q.time_sec < p.time_sec)
            or (q.recall > p.recall and q.time_sec <= p.time_sec)
            for q in points
        )
    return points
