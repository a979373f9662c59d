"""Physical-plan audit: sweep every registered query and flag plan
shapes that won't survive a 100 TB scale-up.

Checks per query (batch queries only; streaming plans are inspected by
their own tests):

- PYTHON_UDF: BatchEvalPython / ArrowEvalPython in the plan — a
  row-at-a-time (or even Arrow) Python boundary in the hot path.
  mapInPandas stages used by the multimodal ops are reported
  separately (MAP_IN_PANDAS) since they are deliberate.
- CARTESIAN: CartesianProduct without a broadcast — the O(n*m)
  trap. BroadcastNestedLoopJoin with a small broadcast side is fine
  (that IS the intended shape for tiny-dim theta joins).
- N_SCANS / N_EXCHANGES: fan-out of source scans and shuffles — a
  jump in either after an edit is a regression signal.
- NO_PUSHDOWN: a parquet scan with no PushedFilters while the plan
  contains a Filter directly above it (heuristic).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Exit code 1 if any hard red flag (PYTHON_UDF outside multimodal,
unbroadcast CARTESIAN) is found.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from canvas_data_loader_spark import queries as Q
from canvas_data_loader_spark.session import get_spark

# Queries whose plans legitimately contain the flagged pattern.
EXPECTED = {
    "q40_multimodal_features": {"MAP_IN_PANDAS"},  # decode stub is a pandas stage by design
    "q16_cross_join": {"CARTESIAN"},  # the operator under test IS a cross join
    # blocked-BLAS band signatures (band_signatures_vectorized): one
    # Arrow dgemm per batch deliberately replaces a 32-expression
    # codegen tree whose COMPILE time dominated (BENCH r4->r5 3.3->1.2s)
    "q116_lsh_neardup_pairs": {"MAP_IN_PANDAS"},
    # blocked-BLAS IVF cell assignment (assign_cells_vectorized) —
    # keep-set pinned identical to the expression path in pytest
    "q118_semantic_dedup": {"MAP_IN_PANDAS"},
}


def audit(name: str, df) -> tuple[dict, list[str]]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    stats = {
        "scans": len(re.findall(r"Scan parquet", plan)),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused": len(re.findall(r"ReusedExchange", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
    }
    flags = []
    if re.search(r"BatchEvalPython|ArrowEvalPython", plan):
        flags.append("PYTHON_UDF")
    if re.search(r"MapInPandas|FlatMapGroupsInPandas", plan):
        flags.append("MAP_IN_PANDAS")
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    flags = [f for f in flags if f not in EXPECTED.get(name, set())]
    return stats, flags


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("plan-audit")
    hard_fail = False
    for name, fn in Q.SPARK.items():
        if only and name not in only:
            continue
        if "stream" in name:
            continue  # streaming plans need a query start; covered in tests/
        try:
            df = fn(spark, sf_dir)
            stats, flags = audit(name, df)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            hard_fail = True
            continue
        status = "FLAG" if flags else "ok"
        if flags:
            hard_fail = hard_fail or any(
                f in ("PYTHON_UDF", "CARTESIAN") for f in flags
            )
        print(
            f"{status:4} {name}: scans={stats['scans']} exch={stats['exchanges']}"
            f" bcast={stats['broadcasts']} reuse={stats['reused']}"
            + (f"  flags={','.join(flags)}" if flags else "")
        )
    sys.exit(1 if hard_fail else 0)


if __name__ == "__main__":
    main()
