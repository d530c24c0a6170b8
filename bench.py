"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the throughput-shaped workloads from BASELINE.md's
interpretation section: exhaustive knn, knn-graph (similarity join),
k-means train+assign, IVF build+search, minhash dedup, relational agg.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from faiss_spark.session import get_spark

BENCH_QUERIES = [
    "knn_tabular",
    "knn_l2",
    "knn_cosine",
    "knn_graph",
    "range_search_l2",
    "ivf_search_exact",
    "pq_adc_search",
    "hamming_knn",
    "kmeans_assign",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_bucketed",
    "text_features",
    "tpch_q1",
]

# entries whose queries() form is an oracle property check (computes
# ground truth alongside the operator) — bench times the RAW workload
BENCH_OVERRIDES = {
    "pq_adc_search": lambda: entrymod._pq_adc_raw,
    "kmeans_assign": lambda: entrymod._kmeans_raw,
    "dedup_embedding_bucketed": lambda: entrymod._dedup_bucketed_raw,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark("faiss_spark_bench")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM/Arrow path and the big-table scan once so timings
    # measure the operators, not session init / first-touch page cache
    qs["knn_l2"](spark, sf_dir).count()
    entrymod._lineitem_features(spark, sf_dir).count()
    for name in BENCH_QUERIES:
        # best-of-2: this host shows 2-4× run-to-run variance from
        # external contention; min-of-two is the engine's number, not
        # the noise's
        fn = BENCH_OVERRIDES[name]() if name in BENCH_OVERRIDES else qs[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
