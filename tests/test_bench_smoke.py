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
    # r9: a write-heavy section (ivf_add) can sit in a disk-contention
    # band the CPU probes never see — the disk probe must exist and
    # feed band_factor like the other two
    assert probe["disk_sec"] > 0
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


def test_sentinel_disk_band_flags_without_cpu_band(tmp_path, monkeypatch):
    """A disk-only contention band (CPU probes clean) must flag
    contended — exactly the BENCH_r08 failure mode (ivf_add 3.1x slow,
    recorded under contended: false)."""
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "CALIBRATION_FILE", str(tmp_path / "c.json"))
    clean = {"numpy_sec": 0.05, "sql_sec": 0.08, "disk_sec": 1.0}
    s = bench_mod._sentinel_summary(clean, clean)
    assert s["calibrated_this_run"] and not s["contended"]
    disk_band = {"numpy_sec": 0.05, "sql_sec": 0.08, "disk_sec": 2.4}
    s2 = bench_mod._sentinel_summary(disk_band, disk_band)
    assert s2["band_factor"] > 1.5 and s2["contended"]
    # a calibration file that PREDATES the disk probe (r8 format) adopts
    # the run's disk draw instead of crashing
    with open(tmp_path / "c.json", "w") as f:
        import json as _json

        _json.dump({"numpy_sec": 0.05, "sql_sec": 0.08}, f)
    s3 = bench_mod._sentinel_summary(clean, clean)
    assert not s3["contended"] and s3["calibration"]["disk_sec"] == 1.0


def test_sentinel_epoch_factor_sees_uniform_slowdown(tmp_path, monkeypatch):
    """VERDICT r10 #7: a uniformly slow machine-day moves probes and
    workload TOGETHER, so band/drift stay in-band (the judge's +40% draw
    read contended: false). epoch_factor = headline total vs the rolling
    window's best headline must surface it as a second label — and age
    out with the window like the probe floors."""
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "CALIBRATION_FILE", str(tmp_path / "c.json"))
    probe = {"numpy_sec": 0.05, "sql_sec": 0.08, "disk_sec": 1.0}
    s = bench_mod._sentinel_summary(probe, probe, headline_total=16.0)
    assert s["epoch_factor"] == 1.0
    # uniformly slow day: probes AND workload +40% — per-probe band 1.4
    # (in-band, not contended) but epoch_factor flags the day
    slow_probe = {k: v * 1.4 for k, v in probe.items()}
    s2 = bench_mod._sentinel_summary(slow_probe, slow_probe, headline_total=22.4)
    assert not s2["contended"]
    assert s2["epoch_factor"] == 1.4
    # the fast epoch ages out of the window like the probe floors
    for _ in range(bench_mod.CAL_WINDOW):
        s3 = bench_mod._sentinel_summary(slow_probe, slow_probe, headline_total=22.4)
    assert s3["epoch_factor"] == 1.0
    # a history that predates headline recording reports None, not a crash
    with open(tmp_path / "c.json", "w") as f:
        import json as _json

        _json.dump({"history": [probe]}, f)
    s4 = bench_mod._sentinel_summary(probe, probe, headline_total=16.0)
    assert s4["epoch_factor"] == 1.0  # this run's own entry seeds the window
    # no headline passed (probe-only callers): field absent, no crash
    s5 = bench_mod._sentinel_summary(probe, probe)
    assert "epoch_factor" not in s5
    # different-sf totals are NOT comparable: an sf0.001 run's tiny
    # headline must not become the sf0.1 floor
    s6 = bench_mod._sentinel_summary(probe, probe, headline_total=0.9, sf="0.001")
    assert s6["epoch_factor"] == 1.0  # its own sf cohort
    s7 = bench_mod._sentinel_summary(probe, probe, headline_total=16.0, sf="0.1")
    assert s7["epoch_factor"] == 1.0  # not 16.0/0.9


def test_sentinel_stale_floor_ages_out(tmp_path, monkeypatch):
    """VERDICT r9 #1: the old best-ever floor never aged — a machine
    change left every subsequent run labeled contended (band ~2.4, drift
    ~1.0) and the label stopped discriminating. The rolling window must
    (a) keep flagging a genuinely slower run while the fast floor is in
    the window, and (b) stop flagging once CAL_WINDOW consistent runs at
    the new normal have aged the stale point out."""
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "CALIBRATION_FILE", str(tmp_path / "c.json"))
    fast = {"numpy_sec": 0.04, "sql_sec": 0.08, "disk_sec": 0.4}
    slow = {k: v * 2.4 for k, v in fast.items()}  # the new machine normal
    bench_mod._sentinel_summary(fast, fast)
    s = bench_mod._sentinel_summary(slow, slow)
    assert s["contended"]  # fast floor still in window: honest flag
    for _ in range(bench_mod.CAL_WINDOW):
        s = bench_mod._sentinel_summary(slow, slow)
    # the stale fast draw aged out; slow IS the floor now
    assert s["band_factor"] == 1.0 and not s["contended"]
    assert s["calibration"]["numpy_sec"] == slow["numpy_sec"]
    # and a faster draw still tightens immediately (self-healing down)
    s2 = bench_mod._sentinel_summary(fast, fast)
    assert s2["calibration"]["numpy_sec"] == fast["numpy_sec"]
    # legacy flat-format file (pre-window): discarded, window restarts
    with open(tmp_path / "c.json", "w") as f:
        import json as _json

        _json.dump({"numpy_sec": 0.01, "sql_sec": 0.01, "disk_sec": 0.01}, f)
    s3 = bench_mod._sentinel_summary(slow, slow)
    assert s3["calibrated_this_run"] and not s3["contended"]
