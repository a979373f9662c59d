"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: python tools/capture_plans.py before|after [name ...]
Writes plans/<PLANS_ROUND, default r14>/<query>_<tag>.txt for each
headline query (or the names given). Plans are built, not executed —
cheap, no data pass. Set PLANS_ROUND=r13 to refresh older captures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from canvas_data_loader_spark import queries as Q
from canvas_data_loader_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        try:
            df = Q.SPARK[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # plan-build failure is itself a finding
            plan = f"PLAN BUILD FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")


if __name__ == "__main__":
    main()
