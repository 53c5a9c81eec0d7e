"""Driver-evidence freshness ledger, computed from the RAW
``CORRECTNESS_r*.json`` artifacts (never from builder claims — the r9
judge caught a COVERAGE freshness claim that was the plan, not the
outcome).

Usage: ``python tools/freshness.py [--window]`` from the repo root.
Prints a markdown table of latest-driver-round counts plus the stale
cohort lists; ``--window`` additionally simulates the seating of the
current ``_WINDOW`` (what freshness WILL be after this round's driver
run) so the COVERAGE.md claim can be generated, clearly labeled, from
the same script.
"""
from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        qs = json.load(open(f))
        qs = qs.get("queries", qs)
        for k in qs:
            latest[k] = max(rnd, latest.get(k, 0))
    return latest


def table(latest: dict[str, int], title: str) -> str:
    counts = collections.Counter(latest.values())
    lines = [f"**{title}** ({len(latest)} keys):", "",
             "| latest driver round | keys |", "|---|---|"]
    for rnd in sorted(counts):
        lines.append(f"| r{rnd} | {counts[rnd]} |")
    oldest = min(counts)
    stale = sorted(k for k, r in latest.items() if r == oldest)
    lines += ["", f"Oldest cohort (r{oldest}): {', '.join(stale)}"]
    return "\n".join(lines)


def main() -> None:
    latest = latest_rounds()
    print(table(latest, "Measured driver-evidence freshness"))
    if "--window" in sys.argv:
        sys.path.insert(0, ROOT)
        import __spark_entry__ as em
        live = set(em.oracle_sql()) | set(em.queries())
        retired = sorted(set(latest) - live)
        nxt = max(latest.values()) + 1
        # project over the LIVE contract only: keys rotated out of the
        # contract (r12: metric_rmse/metric_rmae) keep their historical
        # artifacts but no longer need driver evidence
        post = {k: r for k, r in latest.items() if k in live}
        for k in em._WINDOW:
            post[k] = nxt
        print()
        print(table(post, f"Projected after the r{nxt} window runs green"))
        if retired:
            print(f"\nRetired keys (historical artifacts only, not in the "
                  f"live contract): {', '.join(retired)}")


if __name__ == "__main__":
    main()
