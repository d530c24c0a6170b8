"""Interleaved paired A/B of the NSG bench section: r9 tag vs HEAD
(VERDICT r10 what's-wrong #1 / next-round #3).

Question: every r10 draw read the NSG section 15-20% slower than the r9
artifact (build 12.0-14.1 s vs 9.9; search 7.9-9.8 vs 7.4) while
`nsg.py`, `knn.py` and `kernels.py` are BYTE-IDENTICAL between the two
revisions (verified: `git diff 362683b..HEAD` touches neither). The
drift is therefore either (a) harness-induced — something the r10
bench/session changes do before or around the NSG section — or (b) a
machine epoch. Code cannot differ, so the A/B isolates the harness.

Method (the AQE A/B design, SCALE.md): each arm runs the NSG section
ALONE in a FRESH subprocess/session from its own checkout — HEAD from
the repo, r9 from a `git worktree` pinned at 362683b — with arm order
alternating per round so contention windows hit both arms equally. The
section's own warm-up + best-of-2 discipline is unchanged (it ships in
_nsg_bench). N rounds × 2 arms; we report per-arm min/median of
build_sec and search_sec plus the per-round paired deltas.

Reading the result:
  - arms agree, both at the r9 artifact numbers    -> drift was weather
  - arms agree, both slower than the r9 artifact   -> machine epoch
  - HEAD arm systematically slower than the r9 arm -> harness regression
    (then bisect the bench/session diff)

Usage: python tools/nsg_ab.py [rounds] [r9_worktree]
       (defaults: 4 rounds, /tmp/nsg_ab_r9 — created if missing)
Prints one JSON line; results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R9_SHA = "362683b"

SECTION_SNIPPET = (
    "import sys, json; sys.path.insert(0, '.');"
    "from faiss_spark.session import get_spark;"
    "from bench import _nsg_bench;"
    "spark = get_spark('nsg_ab');"
    "print('NSGAB ' + json.dumps(_nsg_bench(spark, {cpus})))"
)


def _ensure_r9_worktree(path: str) -> str:
    if not os.path.exists(os.path.join(path, "bench.py")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, R9_SHA],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def _draw(cwd: str, cpus: int) -> dict:
    """One fresh-process draw of the NSG section from `cwd`'s code."""
    out = subprocess.run(
        [sys.executable, "-c", SECTION_SNIPPET.format(cpus=cpus)],
        cwd=cwd, capture_output=True, text=True, timeout=1200,
        env={**os.environ, "PYTHONPATH": cwd},
    )
    for line in out.stdout.splitlines():
        if line.startswith("NSGAB "):
            return json.loads(line[len("NSGAB "):])
    raise RuntimeError(
        f"no NSGAB line from {cwd}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r9 = _ensure_r9_worktree(
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/nsg_ab_r9"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    arms = {"r9": r9, "head": REPO}
    draws: dict[str, list[dict]] = {"r9": [], "head": []}
    for r in range(rounds):
        order = ("r9", "head") if r % 2 == 0 else ("head", "r9")
        for arm in order:
            d = _draw(arms[arm], cpus)
            draws[arm].append(d)
            print(
                f"# round {r} {arm}: build {d['build_sec']}s "
                f"search {d['search_sec']}s",
                file=sys.stderr,
            )
    summary: dict = {"rounds": rounds, "cpus": cpus, "r9_sha": R9_SHA}
    for key in ("build_sec", "search_sec"):
        a = [d[key] for d in draws["r9"]]
        b = [d[key] for d in draws["head"]]
        summary[key] = {
            "r9_min": round(min(a), 3),
            "head_min": round(min(b), 3),
            "r9_med": round(statistics.median(a), 3),
            "head_med": round(statistics.median(b), 3),
            "paired_delta_head_minus_r9": [
                round(y - x, 3) for x, y in zip(a, b)
            ],
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
