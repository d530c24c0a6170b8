"""10× scale probe of the big-batch RANGE search
(`range_search_preassigned`, new r12) — the emit-all twin of
tools/preassigned_probe.py.

Method (mirrors the k-NN preassigned probe; lessons in SCALE.md):
- nlist follows the operator's √(2n) balance rule uncapped.
- radius is CALIBRATED once at the 1× size — the quantile of a bounded
  driver-side sample of squared-L2 distances targeting ~TARGET_HITS
  full-scan hits per query — then held fixed across sizes (iid
  synthetic vectors ⇒ scale-invariant hit fraction).
- train (niter=6 — the probe measures SEARCH; a 6M train at the
  default niter=20 costs ~17 idle minutes, see memory notes) and add
  are untimed.
- per-unit metric: scanned candidate volume nq·nprobe·(n/nlist)·d per
  core-second, same as the k-NN row, so the two twins are comparable.

r12 result (SCALE.md): 1.89 s @600k → 9.00 s @6M — wall 4.76× for 10×
rows, ABOVE the √10 of the k-NN twin because range emits every
within-radius pair (5.4× more pairs at 10×) through the per-cell
pandas return frame instead of reducing to ≤ k survivors first.

Usage: python tools/rangepre_probe.py
Prints one JSON line; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from faiss_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NQ = 10_000
D = 64
NPROBE = 8
TARGET_HITS = 50  # full-scan hits per query at the 1x size


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _synth_vecs
    from faiss_spark.operators.ivf import IVFIndex, range_search_preassigned

    spark = get_spark("rangepre_probe")
    base1 = (
        _synth_vecs(spark, 600_000, D, 606_060)
        .repartition(CPUS)
        .localCheckpoint(eager=True)
    )
    qs = (
        _synth_vecs(spark, NQ, D, 24_681)
        .select(F.col("id").alias("qid"), "vec")
        .localCheckpoint(eager=True)
    )
    samp_b = np.stack(
        [r["vec"] for r in base1.limit(20_000).collect()]
    ).astype(np.float64)
    samp_q = np.stack(
        [r["vec"] for r in qs.limit(200).collect()]
    ).astype(np.float64)
    dm = ((samp_q[:, None, :] - samp_b[None, :, :]) ** 2).sum(2)
    radius = float(np.quantile(dm.ravel(), TARGET_HITS / 600_000))

    out = {}
    for label, nv, base in (("600k", 600_000, base1), ("6M", 6_000_000, None)):
        if base is None:
            base = (
                _synth_vecs(spark, nv, D, 606_060)
                .repartition(CPUS)
                .localCheckpoint(eager=True)
            )
        nlist = int((2 * nv) ** 0.5)
        idx = IVFIndex.train(base, nlist=nlist, seed=42, niter=6).add(base)
        idx.codes = idx.codes.localCheckpoint(eager=True)

        def run() -> int:
            return range_search_preassigned(
                idx, qs, radius, nprobe=NPROBE
            ).count()

        run()  # warm-up
        best = None
        hits = 0
        for _ in range(2):
            t0 = time.perf_counter()
            hits = run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        cand = NQ * NPROBE * (nv / nlist) * D
        out[label] = {
            "nv": nv,
            "nlist": nlist,
            "sec": round(best, 3),
            "hits": hits,
            "cand_d_per_core_sec_1e9": round(cand / best / CPUS / 1e9, 4),
        }
        print(f"# {label}: {out[label]}", file=sys.stderr)
        base.unpersist()
    print(
        json.dumps(
            {
                "probe": "range_search_preassigned_scale",
                "radius": round(radius, 4),
                "nq": NQ,
                "nprobe": NPROBE,
                "rows": out,
                "wall_ratio_10x": round(
                    out["6M"]["sec"] / out["600k"]["sec"], 2
                ),
                "per_unit_ratio_10x": round(
                    out["6M"]["cand_d_per_core_sec_1e9"]
                    / out["600k"]["cand_d_per_core_sec_1e9"],
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
