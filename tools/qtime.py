"""Time individual registry queries with the bench methodology.

Usage: python tools/qtime.py [--repeat N] [--sf DIR] q138_... q118_...
Prints per-query median [min, max] over N runs (fresh plan per run,
noop sink, same as bench.py) after one sf0.001 warmup pass.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canvas_data_loader_spark import queries as Q
from canvas_data_loader_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    spark = get_spark("qtime")
    warm = "/root/testdata/sf0.001"
    for name in args.names:
        if os.path.isdir(warm) and warm != args.sf:
            try:
                Q.SPARK[name](spark, warm).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
        runs = []
        for _ in range(args.repeat):
            # drop dead checkpoint blocks between runs (bench.py's
            # drop_dead_blocks rationale — the ContextCleaner won't
            # reclaim them until a JVM GC, 30 min away by default)
            try:
                for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    jrdd.unpersist(False)
            except Exception:
                pass
            t0 = time.perf_counter()
            df = Q.SPARK[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: median={statistics.median(runs):.3f} "
            f"[{min(runs):.3f}, {max(runs):.3f}] n={args.repeat}",
            flush=True,
        )


if __name__ == "__main__":
    main()
