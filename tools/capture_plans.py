"""Capture .explain('formatted') output for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix] [only,names]
Writes plans/<tag>/<query>_<suffix>.txt for every bench query (or the
subset in the comma-separated third argument).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    outdir = os.path.join(repo, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from anofox_forecast_spark.session import get_spark
    import __spark_entry__ as entry_mod
    import bench

    spark = get_spark(app_name="plan-capture", shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")

    # the same bench query list bench.py times
    import re
    src = open(os.path.join(repo, "bench.py")).read()
    m = re.search(r"bench_queries = \[(.*?)\]", src, re.S)
    names = re.findall(r'"([a-z0-9_]+)"', m.group(1))

    qs = entry_mod.queries()
    if only:
        # allow capturing ANY contract query, not just bench ones
        names = sorted(set(names) | (only & set(qs)))
    for name in names:
        if name not in qs or (only and name not in only):
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"captured {name}")
        except Exception as ex:  # noqa: BLE001
            print(f"FAILED {name}: {ex}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
