"""Interleaved paired A/B of the session AQE default
`spark.sql.adaptive.coalescePartitions.initialPartitionNum`
(VERDICT r8 what's-wrong #4 / next-round #3).

Question: the r8 session default max(8·cpus, 256) demonstrably fixes the
5M-doc shuffle spill (SCALE.md), but the sf0.1 headline total sat
~40-55% above r6 across ALL queries while the CPU sentinel read 1.09× —
is the default taxing small-shuffle queries at bench scale, or was that
machine weather?

Method: ONE SparkSession; the conf is runtime-settable, so each paired
draw flips it between 256 and cpus INSIDE the same process, A/B order
alternating per round (contention windows hit both arms equally). N
rounds × full headline list × both arms; per query we report the paired
per-round deltas, the per-arm min and median. This is the ≥5-paired-draw
design the r8 verdict asked for — the r8 builder A/B (5 queries × 2
draws) and the judge's own 2-draw A/B were both under-powered.

Usage: python tools/aqe_ab.py [rounds]   (default 5)
Prints one JSON line; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import BENCH_FORCE_COLUMNS, BENCH_OVERRIDES, BENCH_QUERIES, _run_once
from faiss_spark.session import get_spark

CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("aqe_ab")
    qs = entrymod.queries()
    arms = {"hi": str(max(8 * cpus, 256)), "lo": str(cpus)}

    def run(name: str) -> float:
        fn = BENCH_OVERRIDES[name]() if name in BENCH_OVERRIDES else qs[name]
        t0 = time.perf_counter()
        _run_once(fn(spark, sf_dir), name in BENCH_FORCE_COLUMNS)
        return time.perf_counter() - t0

    # warm scan + JVM once (same as bench.py)
    qs["knn_l2"](spark, sf_dir).count()
    entrymod._lineitem_features(spark, sf_dir).count()

    times: dict[str, dict[str, list[float]]] = {
        q: {"hi": [], "lo": []} for q in BENCH_QUERIES
    }
    for r in range(rounds):
        order = ("hi", "lo") if r % 2 == 0 else ("lo", "hi")
        for arm in order:
            spark.conf.set(CONF, arms[arm])
            for q in BENCH_QUERIES:
                times[q][arm].append(run(q))

    out = {"rounds": rounds, "cpus": cpus, "hi": arms["hi"], "lo": arms["lo"]}
    summary = {}
    tot_hi = tot_lo = 0.0
    for q in BENCH_QUERIES:
        hi, lo = times[q]["hi"], times[q]["lo"]
        deltas = [h - l for h, l in zip(hi, lo)]
        med_hi, med_lo = statistics.median(hi), statistics.median(lo)
        tot_hi += med_hi
        tot_lo += med_lo
        summary[q] = {
            "hi_min": round(min(hi), 3),
            "lo_min": round(min(lo), 3),
            "hi_med": round(med_hi, 3),
            "lo_med": round(med_lo, 3),
            "paired_delta_med": round(statistics.median(deltas), 3),
            "hi_over_lo_med": round(med_hi / med_lo, 3) if med_lo else None,
            # sign consistency: how many of the paired rounds agree with
            # the median's direction (5/5 = a real effect, 3/5 = noise)
            "sign_agree": sum(
                1 for d in deltas
                if (d > 0) == (statistics.median(deltas) > 0)
            ),
        }
        print(
            f"# {q:28s} hi_med={med_hi:7.3f}  lo_med={med_lo:7.3f}  "
            f"ratio={summary[q]['hi_over_lo_med']}  "
            f"agree={summary[q]['sign_agree']}/{rounds}",
            file=sys.stderr,
        )
    out["queries"] = summary
    out["total_hi_med"] = round(tot_hi, 3)
    out["total_lo_med"] = round(tot_lo, 3)
    out["total_ratio"] = round(tot_hi / tot_lo, 3) if tot_lo else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
