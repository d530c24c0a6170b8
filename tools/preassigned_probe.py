"""10× probe of big-batch IVF search (`search_preassigned`) — the
flagship SEARCH shape's measured scale exponent (VERDICT r10 #8).

SCALE.md already carries 10× rows for add (ivf_add), exact knn
(knn_tabular), dedup (minhash-LSH) and the bucketed graph; this tool
adds the remaining headline shape: fully-distributed IVF search where
the query batch is a DataFrame (contrib/ivf_tools search_preassigned —
probe assignment map-side, candidate scan via a partition-pruned join,
no driver collect of queries).

Design (the lessons pinned in SCALE.md / [[spark-graft-pitfalls]]):
- nlist follows the operator's √(2n) balance rule UNCAPPED (1095 at
  600k → 3464 at 6M): holding cell population constant would measure
  the flat coarse-assign GEMM (n·nlist·d), not the operator.
- The corpus is hash-generated synthetically at both scales (no
  replica similarity artifacts possible — vectors are iid by
  construction).
- Train (k-means) and add are OUTSIDE the timed region: the row
  measures SEARCH. The add itself is already covered by the ivf_add
  10× row.
- Per-unit metric: scanned candidate work = nq · nprobe · (n/nlist) ·
  d per query batch — under the balance rule this grows n^0.5, so
  wall-clock for 10× rows should grow ≈ √10 ≈ 3.2× and the per-unit
  throughput (cand·d/core·s) should be flat-or-rising if the plan has
  no hidden fixed-cost cliff.

Usage: python tools/preassigned_probe.py
Prints one JSON line; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faiss_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NQ = 10_000
K = 10
NPROBE = 8
D = 64


def probe(spark, nv: int, layout: str = "memory") -> dict:
    from pyspark.sql import functions as F

    from bench import _synth_vecs
    from faiss_spark.operators.ivf import IVFIndex, search_preassigned

    nlist = max(4, int((2 * nv) ** 0.5))  # the operator's balance rule
    base = (
        _synth_vecs(spark, nv, D, 606_060)
        .repartition(CPUS)
        .localCheckpoint(eager=True)
    )
    queries = (
        _synth_vecs(spark, NQ, D, 24_681)
        .select(F.col("id").alias("qid"), "vec")
        .localCheckpoint(eager=True)
    )
    idx = IVFIndex.train(base, nlist=nlist, seed=42).add(base)
    if layout == "bucketed":
        # on-disk invlists (save_bucketed): the cogroup reads the
        # grouping straight off the scan — zero corpus-side exchange
        import tempfile

        idx.save_bucketed(
            tempfile.mkdtemp(prefix="preassigned_bucketed_"), nbuckets=CPUS
        )
    else:
        # materialize the codes table once (add is the ivf_add row's job)
        idx.codes = idx.codes.localCheckpoint(eager=True)

    def run() -> int:
        return search_preassigned(idx, queries, K, nprobe=NPROBE).count()

    # evidence, not assumption: count the list_no exchanges in the plan
    xplan = search_preassigned(
        idx, queries, K, nprobe=NPROBE
    )._jdf.queryExecution().executedPlan().toString()
    n_exchanges = xplan.count("Exchange hashpartitioning(list_no")

    run()  # warm-up (codegen + broadcast first-touch)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        n = run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    # scanned candidate volume under even cells; real cells are skewed
    # but the estimate is the same at both scales, so the RATIO is fair
    cand = NQ * NPROBE * (nv / nlist)
    base.unpersist()
    return {
        "nv": nv,
        "nlist": nlist,
        "nq": NQ,
        "nprobe": NPROBE,
        "layout": layout,
        "exchanges_list_no": n_exchanges,
        "sec": round(best, 3),
        "result_rows": n,
        "cand_d_per_core_sec_1e9": round(cand * D / best / CPUS / 1e9, 4),
    }


def main() -> None:
    spark = get_spark("preassigned_probe")
    out = {}
    for label, nv in (("sf0.1", 600_000), ("sf1", 6_000_000)):
        out[label] = probe(spark, nv)
        print(f"# {label}: {out[label]}", file=sys.stderr)
    # bucketed-layout A/B at the 10x size (VERDICT r11 #2): same probe,
    # corpus stored CLUSTERED BY list_no — the codes-side exchange is
    # gone (exchanges_list_no drops by 1) and the wall shows what one
    # full-corpus shuffle costs per big-batch search
    out["sf1_bucketed"] = probe(spark, 6_000_000, layout="bucketed")
    print(f"# sf1_bucketed: {out['sf1_bucketed']}", file=sys.stderr)
    r = out["sf1"]["sec"] / out["sf0.1"]["sec"]
    out["wall_ratio_10x"] = round(r, 2)
    out["per_unit_ratio_10x"] = round(
        out["sf1"]["cand_d_per_core_sec_1e9"]
        / out["sf0.1"]["cand_d_per_core_sec_1e9"],
        2,
    )
    out["bucketed_vs_shuffled_sf1"] = round(
        out["sf1_bucketed"]["sec"] / out["sf1"]["sec"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
