"""Physical-plan regression gate (round-8): every registered batch
query's (scans, exchanges, broadcasts, flags) is pinned in
tools/plan_golden.json; an edit that un-broadcasts a join, doubles a
scan, adds a shuffle, or introduces a Python-UDF stage fails HERE, in
CI, instead of surfacing as a bench regression a round later.

Runs tools/plan_audit.py --check in a fresh interpreter (the same
session config the golden was taken under — the test session's
local[4]/4-shuffle-partition config is not the audit config, and the
check must compare like with like). ~60s; plan-only, nothing executes.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_match_committed_golden():
    assert os.path.isfile(
        os.path.join(REPO, "tools", "plan_golden.json")
    ), "golden missing — run: python tools/plan_audit.py --golden"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plan_audit.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    interesting = "\n".join(
        line
        for line in (proc.stdout + proc.stderr).splitlines()
        if line.startswith(("REGRESSION", "ERROR", "note", "plan check"))
    )
    assert proc.returncode == 0, f"plan regression(s):\n{interesting}"
