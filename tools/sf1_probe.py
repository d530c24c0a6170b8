"""sf0.1 → sf1 (10×) probe of the three heaviest headline workloads.

The Arrow-native scan layer's claimed payoff is that the per-row boundary
cost scales with the corpus while the fixed job floor (session dispatch,
codegen compile, Arrow batch setup) does not — so per-unit throughput at
10× the bench scale should be flat or RISING. This tool measures exactly
that, once, so the claim carries a number (VERDICT r9 next-round #8).

Builds a 10× replica of the driver's sf0.1 tables under /tmp (the
driver testdata itself is read-only and tops out at sf0.1):

- ``lineitem``: 10 copies with ``l_orderkey`` offset per replica, so ids
  stay unique and the knn_tabular query side (``l_orderkey < 50``) keeps
  its EXACT sf0.1 selectivity — fixed 200 queries against a 6M-row base,
  which is the scaling regime the per-unit metric (q·v·d/core-s) assumes.
- ``documents``: 10 copies with ``doc_id`` offset; replicas >0 get a
  deterministic word shuffle — sort words by
  ``xxhash64(word, position, replica)``. The word MULTISET is preserved
  (doc length / vocabulary stats unchanged) but word 3-gram shingles
  are destroyed, so cross-replica Jaccard ≈ 0 and the corpus's
  duplicate mass stays the sf0.1 class instead of every doc gaining 9
  planted near-dups — replication must not manufacture a quadratic
  candidate blow-up the real corpus doesn't have. The POSITION in the
  sort key matters: a first draft sorted by ``xxhash64(word, replica)``
  alone, which is a CANONICAL ordering — any two docs with overlapping
  vocabulary collapse onto overlapping sorted sequences, so
  bag-of-words similarity became sequence similarity and the shuffled
  replicas gained ~5600× the pair mass (1.44M pairs vs 10×256). Keying
  by position makes each doc's permutation content-dependent
  (exact-dup pairs within a replica survive: identical text → identical
  permutation) without canonicalizing across docs.
- every other table: symlinked unchanged (load_tables reads them all).

Workloads:
- ``knn_tabular``: the __spark_entry__ headline query verbatim at both
  sf dirs (200 queries × 600k → 6M vectors).
- ``dedup_minhash_lsh``: the headline query verbatim (5k → 50k docs).
- ``graph_bucketed``: bench._graph_bench's workload at 600k → 6M nodes
  with the operator's own balance rule nlist = √(2n) UNCAPPED (1095 →
  3464; the bench's cap at 1024 is a bench-size convenience). A first
  draft held cell population constant (nlist ∝ n, 10240 cells at 6M)
  and measured 50× wall for 10× data — NOT a plan defect but the flat
  coarse assign's n·nlist·d term dominating, which is precisely why
  the operator docstring prescribes √(n·nprobe) and why billion-scale
  coarse assignment routes through a nested quantizer (IVFNestedIndex
  / IMI) instead of a flat argmin. The balance rule splits the n·nlist
  assign term and the n²/nlist scan term evenly, each growing n^1.5.

Usage: python tools/sf1_probe.py [--skip-build]
Prints one JSON line; humans read SCALE.md where results are recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faiss_spark.session import TABLES, get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPLICAS = 10
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _best_of(fn, runs: int = 2, warm: bool = True) -> float:
    if warm:
        fn()
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def build_sf1(spark) -> None:
    import shutil

    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)

    # --- lineitem: orderkey-offset replicas --------------------------------
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    ok_span = li.agg(F.max("l_orderkey")).first()[0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("__rep"))
    li10 = li.crossJoin(reps).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("__rep") * F.lit(ok_span)
    ).drop("__rep")
    out = f"{SF1_DIR}/lineitem.parquet"
    shutil.rmtree(out, ignore_errors=True)
    li10.write.mode("overwrite").parquet(out)

    # --- documents: id-offset replicas, words hash-shuffled for rep>0 ------
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    id_span = docs.agg(F.max("doc_id")).first()[0] + 1
    shuffled = F.expr(
        "concat_ws(' ', transform(array_sort(transform(split(text, ' '), "
        "(w, i) -> struct(xxhash64(w, i, __rep) as h, w as w))), s -> s.w))"
    )
    docs10 = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(id_span))
        .withColumn(
            "text", F.when(F.col("__rep") == 0, F.col("text")).otherwise(shuffled)
        )
        .drop("__rep")
    )
    out = f"{SF1_DIR}/documents.parquet"
    shutil.rmtree(out, ignore_errors=True)
    docs10.write.mode("overwrite").parquet(out)

    # --- everything else: symlink unchanged --------------------------------
    for name in TABLES:
        if name in ("lineitem", "documents"):
            continue
        dst = f"{SF1_DIR}/{name}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{SF01}/{name}.parquet", dst)


def probe_headline(spark, name: str, unit_fn) -> dict:
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    out = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1_DIR)):
        sec = _best_of(lambda: fn(spark, sf_dir).count())
        out[label] = {"sec": round(sec, 3), **unit_fn(sf_dir, sec)}
    return out


def probe_graph(spark) -> dict:
    from bench import _synth_vecs
    from faiss_spark.operators.graph import knn_graph_bucketed

    d, k = 64, 10
    out = {}
    for label, nv in (("sf0.1", 600_000), ("sf1", 6_000_000)):
        nlist = max(4, int((2 * nv) ** 0.5))  # balance rule, uncapped
        base = (
            _synth_vecs(spark, nv, d, 424_242)
            .repartition(CPUS)
            .localCheckpoint(eager=True)
        )
        edges = [0]

        def run():
            edges[0] = knn_graph_bucketed(
                base, k, nlist=nlist, nprobe=2, dtype="f32"
            ).count()

        sec = _best_of(run)
        out[label] = {
            "sec": round(sec, 3),
            "nodes": nv,
            "nlist": nlist,
            "edges": edges[0],
            "edges_per_core_sec": round(edges[0] / sec / CPUS, 1),
        }
        base.unpersist()
    return out


def main() -> None:
    import duckdb

    spark = get_spark("faiss_spark_sf1_probe")
    if "--skip-build" not in sys.argv:
        t0 = time.perf_counter()
        build_sf1(spark)
        print(f"# sf1 build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    nq = 200  # knn_tabular query count (id < 500 over replica 0, ≈200 rows)
    d7 = 7

    def knn_unit(sf_dir, sec):
        nv = duckdb.sql(
            f"select count(*) from '{sf_dir}/lineitem.parquet/**/*.parquet'"
            if os.path.isdir(f"{sf_dir}/lineitem.parquet")
            else f"select count(*) from '{sf_dir}/lineitem.parquet'"
        ).fetchone()[0]
        return {
            "nv": nv,
            "qvd_per_core_sec_1e9": round(nv * nq * d7 / sec / CPUS / 1e9, 4),
        }

    def docs_unit(sf_dir, sec):
        nd = duckdb.sql(
            f"select count(*) from '{sf_dir}/documents.parquet/**/*.parquet'"
            if os.path.isdir(f"{sf_dir}/documents.parquet")
            else f"select count(*) from '{sf_dir}/documents.parquet'"
        ).fetchone()[0]
        return {"docs": nd, "docs_per_core_sec": round(nd / sec / CPUS, 1)}

    result = {
        "knn_tabular": probe_headline(spark, "knn_tabular", knn_unit),
        "dedup_minhash_lsh": probe_headline(spark, "dedup_minhash_lsh", docs_unit),
        "graph_bucketed": probe_graph(spark),
        "replicas": REPLICAS,
        "cpus": CPUS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
