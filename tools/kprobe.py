"""Quick kernel-iteration probe: scaled-down version of bench._kernel_bench
(one timed run, smaller problem) so kernel changes can be measured in ~30 s
instead of ~7 min. Not part of the driver bench."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from faiss_spark.operators.knn import knn
from faiss_spark.session import get_spark


def main():
    nv = int(os.environ.get("KP_NV", "150000"))
    nq = int(os.environ.get("KP_NQ", "5000"))
    d = int(os.environ.get("KP_D", "64"))
    k = 10
    dtype = os.environ.get("KP_DTYPE", "f64")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("kprobe", cpus=cpus)

    def synth(n, salt):
        return spark.range(n).select(
            "id",
            F.expr(
                f"transform(sequence(0, {d - 1}), j -> "
                f"cast(pmod(xxhash64(id * {d} + j + {salt}), 100000) "
                "as float) / 100000.0 - 0.5)"
            ).alias("vec"),
        )

    base = synth(nv, 0).repartition(cpus).localCheckpoint(eager=True)
    queries = synth(nq, 7_777_777).select(F.col("id").alias("qid"), "vec")
    kw = {}
    if dtype != "f64":
        kw["dtype"] = dtype
    # warm
    n = knn(base, queries.limit(64), k, **kw).count()
    t0 = time.perf_counter()
    n = knn(base, queries, k, **kw).count()
    dt = time.perf_counter() - t0
    assert n == nq * k, n
    flops = 2.0 * nv * nq * d
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((nq, d))
    chunk = rng.standard_normal((nv // 10, d))
    t0 = time.perf_counter()
    for _ in range(10):
        Q @ chunk.T
    np_sec = time.perf_counter() - t0
    print(
        f"spark={dt:.2f}s numpy={np_sec:.2f}s ratio={dt / np_sec:.2f} "
        f"gflops={flops / dt / 1e9:.1f} (nv={nv} nq={nq} d={d} dtype={dtype})"
    )


if __name__ == "__main__":
    main()
