"""Interleaved A/B benchmark: round-2 snapshot vs current HEAD.

The round-1→2 verdict flagged q1/q4/q7 regressions measured from two
single runs 4.5h apart — exactly the comparison this host's 2-6×
throughput fluctuation invalidates. This script alternates full bench.py
runs of the two code versions within one session (A B A B A B), takes
best-of-N per query per side, and prints the comparison — noise affects
both sides equally, so a surviving delta is real.

Usage: python scripts/ab_bench.py [r2_dir] [rounds]
  r2_dir: extracted snapshot of the round-2 commit (git archive), with
          fixtures_data symlinked to the live repo so both sides read
          identical bytes. Default /tmp/r2snap.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

R2 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2snap"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
R3 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(root: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    env["SPARK_GRAFT_REPO"] = root
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        cwd=root, env=env, capture_output=True, text=True, timeout=900,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {root}: {out.stderr[-2000:]}")


def main() -> None:
    results: dict[str, list[dict]] = {"r2": [], "r3": []}
    for i in range(ROUNDS):
        for tag, root in (("r2", R2), ("r3", R3)):
            r = run_bench(root)
            results[tag].append(r["queries"])
            print(f"round {i + 1} {tag}: {json.dumps(r['queries'])}", flush=True)
    qnames = sorted(set().union(*(set(q) for q in results["r2"] + results["r3"])))
    best = {
        tag: {q: min(run[q] for run in results[tag] if q in run) for q in qnames if any(q in run for run in results[tag])}
        for tag in ("r2", "r3")
    }
    print(f"\n{'query':34s} {'r2 best':>9s} {'r3 best':>9s} {'delta':>8s}")
    for q in qnames:
        a, b = best["r2"].get(q), best["r3"].get(q)
        if a is None or b is None:
            print(f"{q:34s} {a or '-':>9} {b or '-':>9}   (one side only)")
            continue
        print(f"{q:34s} {a:9.3f} {b:9.3f} {100 * (b - a) / a:+7.1f}%")
    print(json.dumps({"ab_best": best}))


if __name__ == "__main__":
    main()
