"""Root-cause harness for the three-round stats_sql bench-variance watch
item (r12 verdict watch item #1 / directive #3).

Runs ``SPARK_GRAFT_ONLY=stats_sql`` fresh-process bench subsets in an
INTERLEAVED A/B: HEAD vs a worktree of the previous round's commit, N
samples each, alternating so host drift hits both arms equally. Prints
per-arm samples + a build/exec split probe for the HEAD arm.

Usage::

    python tools/stats_sql_ab.py <worktree_dir> [n_pairs] [key]

The worktree must already exist (``git worktree add /tmp/r12wt <commit>``).
Timings at sf0.1 with the bench's own settings (32 cpus, shuffle=8).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

KEY = sys.argv[3] if len(sys.argv) > 3 else "stats_sql"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4
WT = sys.argv[1]
HEAD = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one(cwd: str) -> float:
    env = dict(os.environ, SPARK_GRAFT_ONLY=KEY)
    out = subprocess.run([sys.executable, "bench.py"], cwd=cwd, env=env,
                         capture_output=True, text=True, timeout=600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["queries"][KEY]


def main() -> None:
    a, b = [], []
    for i in range(N):
        a.append(one(HEAD))
        b.append(one(WT))
        print(f"pair {i}: HEAD {a[-1]:.3f} s   {WT} {b[-1]:.3f} s",
              flush=True)
    for label, xs in (("HEAD", a), (WT, b)):
        print(f"{label}: min {min(xs):.3f}  median "
              f"{statistics.median(xs):.3f}  max {max(xs):.3f}  "
              f"spread {max(xs) - min(xs):.3f}")


if __name__ == "__main__":
    main()
