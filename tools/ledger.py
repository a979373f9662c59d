"""Cross-round verification ledger: which round's driver CORRECTNESS
row last proved each registered query, and whether that proof is still
current (a query whose implementation or oracle changed after its last
green row must be re-queued, not assumed green).

Usage: python tools/ledger.py            # markdown table to stdout
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[int, dict]:
    out = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            out[rnd] = json.load(f)
    return out


def main() -> None:
    from canvas_data_loader_spark import queries as Q

    rounds = load_rounds()
    print("| query | last green driver row | failed rows | status |")
    print("|---|---|---|---|")
    never = []
    for name in sorted(Q.SPARK):
        green, failed = [], []
        for rnd, data in rounds.items():
            row = data.get(name)
            if row is None:
                continue
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            )
            (green if ok else failed).append(rnd)
        status = (
            "green" if green and (not failed or max(green) > max(failed))
            else "FAILED last check" if failed
            else "never in driver window"
        )
        if status != "green":
            never.append(name)
        print(
            f"| {name} | {('r%d' % max(green)) if green else '—'} |"
            f" {','.join('r%d' % r for r in failed) or '—'} | {status} |"
        )
    print()
    print(f"{len(never)} without a current green row: {', '.join(never)}")


if __name__ == "__main__":
    main()
