"""Interleaved paired A/B of the r11-regressed bench queries: r10 tag
vs HEAD (VERDICT r11 next-round #8).

Question: BENCH_r11 read dedup_minhash_lsh +28% and tpch_q1 +21% over
BENCH_r10 while the r11 diff touches no dedup.py/text.py/tpch code
(`git diff bd2fcd8..HEAD` confirms). The r11 adjudication pinned a
~25-35% machine epoch between r9 and r10 on OTHER sections; this A/B
closes the book on these two: arms that agree within noise while both
sit above the r10 artifact numbers = epoch (expected); a HEAD arm
systematically slower than the r10 arm = a real harness/code regression
to bisect.

Method (the nsg_ab protocol): each arm runs the two queries ALONE in a
FRESH subprocess/session from its own checkout — HEAD from the repo,
r10 from a `git worktree` pinned at bd2fcd8 — warm-up + best-of-2 per
draw, arm order alternating per round so contention windows hit both
arms equally.

Usage: python tools/dedup_ab.py [rounds] [r10_worktree]
       (defaults: 4 rounds, /tmp/dedup_ab_r10 — created if missing)
Prints one JSON line; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R10_SHA = "bd2fcd8"

SECTION_SNIPPET = (
    "import sys, json, time; sys.path.insert(0, '.');"
    "import __spark_entry__ as m;"
    "from faiss_spark.session import get_spark;"
    "import os;"
    "sf = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1');"
    "spark = get_spark('dedup_ab', cpus={cpus});"
    "out = {{}};\n"
    "for name in ('dedup_minhash_lsh', 'tpch_q1'):\n"
    "    fn = m.queries()[name]\n"
    "    fn(spark, sf).count()  # warm-up\n"
    "    best = None\n"
    "    for _ in range(2):\n"
    "        t0 = time.perf_counter(); fn(spark, sf).count()\n"
    "        dt = time.perf_counter() - t0\n"
    "        best = dt if best is None else min(best, dt)\n"
    "    out[name] = round(best, 3)\n"
    "print('DEDUPAB ' + json.dumps(out))"
)


def _ensure_r10_worktree(path: str) -> str:
    if not os.path.exists(os.path.join(path, "bench.py")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, R10_SHA],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def _draw(cwd: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", SECTION_SNIPPET.format(cpus=cpus)],
        cwd=cwd, capture_output=True, text=True, timeout=1800,
        env={**os.environ, "PYTHONPATH": cwd},
    )
    for line in out.stdout.splitlines():
        if line.startswith("DEDUPAB "):
            return json.loads(line[len("DEDUPAB "):])
    raise RuntimeError(
        f"no DEDUPAB line from {cwd}:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r10 = _ensure_r10_worktree(
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/dedup_ab_r10"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    arms = {"r10": [], "head": []}
    for i in range(rounds):
        order = (
            [("r10", r10), ("head", REPO)]
            if i % 2 == 0
            else [("head", REPO), ("r10", r10)]
        )
        for name, cwd in order:
            arms[name].append(_draw(cwd, cpus))
    summary = {}
    for q in ("dedup_minhash_lsh", "tpch_q1"):
        a = [d[q] for d in arms["r10"]]
        b = [d[q] for d in arms["head"]]
        summary[q] = {
            "r10_min": min(a), "r10_median": statistics.median(a),
            "head_min": min(b), "head_median": statistics.median(b),
            "head_vs_r10_min": round(min(b) / min(a), 3),
            "paired_deltas": [round(y - x, 3) for x, y in zip(a, b)],
        }
    print(json.dumps({"probe": "dedup_ab", "rounds": rounds, **summary}))


if __name__ == "__main__":
    main()
