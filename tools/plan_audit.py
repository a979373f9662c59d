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

Usage:
  python tools/plan_audit.py [sf_dir] [query ...]   # report
  python tools/plan_audit.py --golden [sf_dir]      # write plan_golden.json
  python tools/plan_audit.py --check [sf_dir]       # diff against golden

Exit code 1 if any hard red flag (PYTHON_UDF outside multimodal,
unbroadcast CARTESIAN) is found — or, under --check, if any query's
plan REGRESSED against tools/plan_golden.json: more scans, more
exchanges, fewer broadcasts, or a new flag. A future edit that
un-broadcasts a join or doubles a scan fails CI here instead of
surfacing as a bench regression a round later. Improvements (fewer
scans/exchanges, more broadcasts) and brand-new queries are reported
and require re-running --golden, keeping the golden current on
purpose. Goldens are taken at the driver's sf0.01 against
/root/testdata; a testdata regeneration can legitimately flip a
borderline broadcast decision — re-golden when TESTDATA.md changes.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_golden.json")

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
    # round-13: q168 moved to the same blocked-BLAS assignment lane as
    # q118 (vectorized ivf_topk; parity pinned, bitdiff both SFs)
    "q168_ann_index_probe": {"MAP_IN_PANDAS"},
    # WAV encode + decode are Python by nature (stdlib `wave` over
    # binary payloads) — the media-decode pandas lane, like q40
    "q175_audio_stats": {"MAP_IN_PANDAS"},
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


def collect(spark, sf_dir: str, only: set[str]) -> tuple[dict, bool]:
    """(per-query {stats + flags}, hard_fail) over the batch registry."""
    out: dict[str, dict] = {}
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
        hard_fail = hard_fail or any(
            f in ("PYTHON_UDF", "CARTESIAN") for f in flags
        )
        out[name] = {**stats, "flags": sorted(flags)}
    return out, hard_fail


def check_against_golden(current: dict) -> list[str]:
    """Regression report vs the committed golden; empty = clean."""
    with open(GOLDEN_PATH) as fh:
        golden = json.load(fh)
    problems = []
    for name, cur in current.items():
        g = golden.get(name)
        if g is None:
            problems.append(
                f"{name}: not in golden — run tools/plan_audit.py --golden"
            )
            continue
        if cur["scans"] > g["scans"]:
            problems.append(
                f"{name}: scans {g['scans']} -> {cur['scans']} (scan fan-out)"
            )
        if cur["exchanges"] > g["exchanges"]:
            problems.append(
                f"{name}: exchanges {g['exchanges']} -> {cur['exchanges']} "
                "(new shuffle)"
            )
        if cur["broadcasts"] < g["broadcasts"]:
            problems.append(
                f"{name}: broadcasts {g['broadcasts']} -> "
                f"{cur['broadcasts']} (join un-broadcast)"
            )
        new_flags = set(cur["flags"]) - set(g.get("flags", []))
        if new_flags:
            problems.append(f"{name}: new flags {sorted(new_flags)}")
        improved = (
            cur["scans"] < g["scans"]
            or cur["exchanges"] < g["exchanges"]
            or cur["broadcasts"] > g["broadcasts"]
        )
        if improved:
            print(f"note {name}: plan improved vs golden — re-golden to pin")
    return problems


def main() -> None:
    args = sys.argv[1:]
    mode = None
    if args and args[0] in ("--golden", "--check"):
        mode = args.pop(0)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("plan-audit")
    current, hard_fail = collect(spark, sf_dir, only)
    for name, row in current.items():
        status = "FLAG" if row["flags"] else "ok"
        print(
            f"{status:4} {name}: scans={row['scans']} exch={row['exchanges']}"
            f" bcast={row['broadcasts']} reuse={row['reused']}"
            + (f"  flags={','.join(row['flags'])}" if row["flags"] else "")
        )
    if mode == "--golden":
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
        print(f"golden written: {GOLDEN_PATH} ({len(current)} queries)")
    elif mode == "--check":
        problems = check_against_golden(current)
        for p in problems:
            print(f"REGRESSION {p}")
        if problems:
            sys.exit(1)
        print(f"plan check clean vs golden ({len(current)} queries)")
    sys.exit(1 if hard_fail else 0)


if __name__ == "__main__":
    main()
