"""Phase profile of knn_graph_bucketed at the bench shape: times each
pipeline prefix with the noop sink (guide §1.4) so phase costs fall out
by subtraction — kmeans fit / cell assign / per-cell local knn / edge
merge. The stages are replicated from operators/graph.py (they are
closures there); the kernels called are the operator's own. Working
evidence for OPTIMIZATION_r13.md; not part of bench.py.

Usage: python tools/graph_profile.py [draws]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

import bench
from faiss_spark.session import get_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    draws = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("graph_profile", cpus=cpus)
    from faiss_spark.kernels import (
        SIMILARITY_METRICS,
        TopKAccumulator,
        as_matrix,
    )
    from faiss_spark.operators.cluster import KMeans
    from faiss_spark.operators.graph import knn_graph_bucketed

    nv, d, k = 600_000, 64, 10
    nlist = max(4, min(1024, int((2 * nv) ** 0.5)))
    nprobe = 2
    metric = "l2"
    np_dt = np.float32
    base = bench._synth_vecs(spark, nv, d, 424_242).repartition(
        cpus
    ).localCheckpoint(eager=True)
    base.count()

    out: dict[str, object] = {}

    def timed(name, fn):
        fn()  # warm-up
        best = None
        for _ in range(draws):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}", file=sys.stderr)

    vecs = base.select(F.col("id").cast("bigint").alias("id"), F.col("vec"))

    def fit():
        return KMeans(
            k=nlist, niter=4, seed=1234, max_points_per_centroid=64
        ).fit(vecs)

    timed("p1_kmeans_fit", fit)
    km = fit()
    C = km.centroids
    bc = spark.sparkContext.broadcast((C, metric, nprobe))

    # --- replica of the operator's assign_cells stage -------------------
    def assign_cells(batches):
        from faiss_spark.kernels import _compute_block, _row_chunk

        C_, metric_, nprobe_ = bc.value
        Ch = np.ascontiguousarray(C_, dtype=np_dt)
        cn = (Ch * Ch).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = as_matrix(pdf["vec"], dtype=np_dt)
            xq = (X * X).sum(axis=1)
            n = len(X)
            cells = np.empty((n, nprobe_), dtype=np.int64)
            chunk = _row_chunk(n, len(C_), X.shape[1], metric_, X.dtype)
            for r0 in range(0, n, chunk):
                r1 = min(n, r0 + chunk)
                D = _compute_block(X, Ch, r0, r1, metric_, xq, cn, X.dtype)
                key = D
                part = np.argpartition(key, nprobe_ - 1, axis=1)[:, :nprobe_]
                sub = np.take_along_axis(key, part, axis=1)
                cells[r0:r1] = np.take_along_axis(
                    part, np.argsort(sub, axis=1, kind="stable"), axis=1
                )
            yield pd.DataFrame(
                {
                    "cell": cells.ravel().astype(np.int32),
                    "id": np.repeat(pdf["id"].to_numpy(np.int64), nprobe_),
                    "vec": np.repeat(pdf["vec"].to_numpy(), nprobe_),
                }
            )

    assigned = vecs.mapInPandas(
        assign_cells, schema="cell int, id bigint, vec array<float>"
    )
    timed("p2_assign_noop", lambda: noop(assigned))

    def local_knn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"src": [], "dst": [], "dist": []}).astype(
                {"src": np.int64, "dst": np.int64, "dist": np.float64}
            )
        ids = pdf["id"].to_numpy(np.int64)
        X = as_matrix(pdf["vec"], dtype=np_dt)
        m = len(ids)
        kk = min(k, m - 1)
        acc = TopKAccumulator(m, kk, False)
        acc.bind_queries(X, metric)
        acc.push_block(X, ids, qids=ids, exclude_same_id=True)
        qidx, nid, nd = acc.emit()
        fin = np.isfinite(nd)
        return pd.DataFrame(
            {
                "src": ids[qidx[fin]],
                "dst": nid[fin],
                "dist": nd[fin].astype(np.float64, copy=False),
            }
        )

    cands = assigned.groupBy("cell").applyInPandas(
        local_knn, schema="src bigint, dst bigint, dist double"
    )
    timed("p3_cands_noop", lambda: noop(cands))

    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    merged = (
        cands.repartition(F.col("src"))
        .groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "dist", "rank")
    )
    timed("p4_full_noop", lambda: noop(merged))
    timed("p4_full_count", lambda: knn_graph_bucketed(
        base, k, nlist=nlist, nprobe=2, dtype="f32").count())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
