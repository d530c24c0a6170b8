"""Per-query isolation profiler (r13/r14 optimization rounds).

Times individual headline queries with the EXACT bench methodology
(same warm-up, same `_run_once` timed action, min over N draws) so a
single query can be studied without paying a whole bench run, and
optionally dumps `.explain("formatted")` to a file per query
(plans/$QPROF_PLAN_DIR/<name>_<tag>.txt, default r14).

Usage:
  python tools/qprof.py [--draws N] [--explain-tag TAG] [query ...]

Not part of the driver bench; numbers here are working evidence for
the round's OPTIMIZATION notes, the artifact numbers stay bench.py's.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import (
    BENCH_FORCE_COLUMNS,
    BENCH_OVERRIDES,
    BENCH_QUERIES,
    _run_once,
    _sentinel_probe,
)
from faiss_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    draws = 2
    tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--draws":
            draws = int(args[i + 1])
            i += 2
        elif args[i] == "--explain-tag":
            tag = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = list(BENCH_QUERIES)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qprof")
    qs = entrymod.queries()
    qs["knn_l2"](spark, sf_dir).count()
    entrymod._lineitem_features(spark, sf_dir).count()
    sent = _sentinel_probe(spark)
    out: dict[str, object] = {"sentinel": sent}
    plandir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("QPROF_PLAN_DIR", "r14"),
    )
    for name in names:
        fn = BENCH_OVERRIDES[name]() if name in BENCH_OVERRIDES else qs[name]
        force = name in BENCH_FORCE_COLUMNS
        if tag is not None:
            os.makedirs(plandir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(plandir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        ds = []
        for _ in range(draws):
            spark.sparkContext.setJobDescription(f"qprof:{name}")
            t0 = time.perf_counter()
            _run_once(fn(spark, sf_dir), force)
            ds.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(ds), "draws": ds}
        print(f"# {name}: {min(ds)} {ds}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
