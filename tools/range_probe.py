"""Range-search scale probe: 600k -> 6M rows at ~constant selectivity
(VERDICT r11 next-round #7 — the one headline family without a measured
scale exponent).

Radius is CALIBRATED, not guessed: a driver-side sample of query-base
distances picks the quantile that yields ~TARGET_HITS per query at the
1x size; the same radius is then used at every size. The synthetic
vectors are iid across sizes, so the hit FRACTION stays constant and
the emitted rows grow linearly with n — per-unit cost (query·vector·dim
per core-second) flat-or-rising means the scan + emit plan has no
super-linear term.

Usage: python tools/range_probe.py [--quick]
Prints one JSON line; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import _synth_vecs  # noqa: E402
from faiss_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
D = 64
NQ = 10_000
TARGET_HITS = 50  # per query at the 1x size


def _best_of(fn, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _calibrate_radius(spark, nv_1x: int) -> float:
    """Quantile of the query-base L2 distance distribution such that the
    expected hits per query ≈ TARGET_HITS at nv_1x (driver-side numpy on
    a bounded sample — 200 queries × 20k base = 4M distances)."""
    qs = np.stack(
        _synth_vecs(spark, 200, D, 7_777_777).toPandas()["vec"].to_numpy()
    ).astype(np.float64)
    xs = np.stack(
        _synth_vecs(spark, 20_000, D, 1).toPandas()["vec"].to_numpy()
    ).astype(np.float64)
    d2 = (
        (qs * qs).sum(1)[:, None]
        + (xs * xs).sum(1)[None, :]
        - 2.0 * (qs @ xs.T)
    )
    # the engine follows the faiss convention: L2 "dist" is SQUARED
    return float(np.quantile(np.maximum(d2, 0.0).ravel(), TARGET_HITS / nv_1x))


def probe_range(spark, nv: int, radius: float) -> dict:
    from faiss_spark.operators.knn import range_search

    base = (
        _synth_vecs(spark, nv, D, 1)
        .repartition(CPUS)
        .localCheckpoint(eager=True)
    )
    queries = _synth_vecs(spark, NQ, D, 7_777_777).selectExpr(
        "id as qid", "vec"
    )
    res = range_search(base, queries, radius)
    hits = res.count()  # warm-up + selectivity check in one pass
    sec = _best_of(lambda: range_search(base, queries, radius).count())
    return {
        "nv": nv,
        "sec": round(sec, 3),
        "hits": hits,
        "hits_per_query": round(hits / NQ, 2),
        "qvd_per_core_sec_1e9": round(nv * NQ * D / sec / CPUS / 1e9, 3),
    }


def main() -> None:
    quick = "--quick" in sys.argv
    nv_1x = 60_000 if quick else 600_000
    spark = get_spark("range_probe", cpus=CPUS)
    radius = _calibrate_radius(spark, nv_1x)
    rows = [probe_range(spark, nv_1x, radius)]
    rows.append(probe_range(spark, 10 * nv_1x, radius))
    r1, r10 = rows
    print(json.dumps({
        "probe": "range_search_scale",
        "radius": round(radius, 4),
        "nq": NQ,
        "rows": rows,
        "wall_ratio_10x": round(r10["sec"] / r1["sec"], 2),
        "per_unit_ratio_10x": round(
            r10["qvd_per_core_sec_1e9"] / r1["qvd_per_core_sec_1e9"], 2
        ),
    }))


if __name__ == "__main__":
    main()
