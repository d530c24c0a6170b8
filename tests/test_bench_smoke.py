"""Smoke test for bench.py's machinery — a NameError-class regression in
the bench must fail pytest, not void a round's BENCH artifact (it did
once: BENCH_r02 recorded rc=1 from an undefined variable). Runs the real
code paths at toy sizes; the heavy sf0.1 queries are not executed."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod


def test_bench_query_list_resolves():
    qs = entrymod.queries()
    for name in bench.BENCH_QUERIES:
        assert name in qs, f"BENCH_QUERIES entry {name!r} not in queries()"
    for name, get in bench.BENCH_OVERRIDES.items():
        assert callable(get()), f"override {name!r} does not resolve"


def test_kernel_bench_machinery(spark):
    out = bench._kernel_bench(spark, cpus=8, nv=2_000, nq=100)
    assert out["spark_sec"] > 0 and out["numpy_gemm_sec"] > 0
    assert out["spark_sec_f32"] > 0 and out["ratio_vs_blas_f32"] > 0


def test_graph_bench_machinery(spark):
    out = bench._graph_bench(spark, cpus=8, nv=1_000)
    assert out["edges"] > 0 and out["sec"] > 0


def test_kmeans_bench_machinery(spark):
    out = bench._kmeans_bench(spark, cpus=8, nv=2_000, k=16)
    assert out["fit_sec"] > 0 and out["assign_sec"] > 0


def test_ivf_add_bench_machinery(spark):
    out = bench._ivf_add_bench(spark, cpus=8, nv=2_000)
    assert out["rows_per_sec"] > 0


def test_nsg_bench_machinery(spark):
    out = bench._nsg_bench(spark, cpus=8, nv=2_000, nq=100)
    assert out["build_rows_per_sec"] > 0 and out["queries_per_sec"] > 0
    assert out["result_rows"] > 0 and out["nv"] > 0


def test_sentinel_machinery(spark, tmp_path, monkeypatch):
    """The contention sentinel must (1) run both fixed-work probes, (2)
    write a calibration file on first sight, (3) self-heal a stale
    (too-slow) calibration, (4) flag a fabricated 2x band as contended."""
    monkeypatch.setattr(bench, "CALIBRATION_FILE", str(tmp_path / "cal.json"))
    probe = bench._sentinel_probe(spark)
    assert probe["numpy_sec"] > 0 and probe["sql_sec"] > 0
    s = bench._sentinel_summary(probe, probe)
    assert s["calibrated_this_run"] is True
    assert s["drift_factor"] == 1.0 and not s["contended"]
    # second run against the stored calibration: identical probes => clean
    s2 = bench._sentinel_summary(probe, probe)
    assert s2["calibrated_this_run"] is False and not s2["contended"]
    # fabricate a 2x-slower run: band_factor ~2, flagged
    slow = {k: v * 2 for k, v in probe.items()}
    s3 = bench._sentinel_summary(slow, slow)
    assert s3["band_factor"] > 1.5 and s3["contended"]
    # self-healing: a faster draw tightens the stored calibration
    fast = {k: v / 2 for k, v in probe.items()}
    s4 = bench._sentinel_summary(fast, fast)
    assert s4["calibration"]["numpy_sec"] == fast["numpy_sec"]
    assert not s4["contended"]
