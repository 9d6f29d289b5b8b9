"""Fleet-wide physical-plan audit: exchange / single-partition /
Python-boundary counts for every declared workload.

Each workload is EXECUTED (collect at the given SF) before its plan is
read, so with AQE enabled the audit reports the FINAL adaptive plan —
the exchanges that actually ran — not the pre-execution initial plan
(which overstates shuffles AQE later removes and misses its runtime
choices). Counts cover hash, range, round-robin, and single-partition
exchanges plus Arrow/Python boundaries.

The companion guardrail test
(tests/test_scale_plans.py::TestNoUndocumentedSinglePartition) FAILS
on undocumented single-partition stages; this tool prints the whole
table so a reviewer can see the shuffle budget per query at a glance.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from odibi_spark import get_spark
    from odibi_spark.workloads import QUERIES

    spark = get_spark("plan_audit")
    print(f"{'workload':42s} {'hash':>4s} {'rng':>4s} {'rr':>3s} {'1p':>3s} {'py':>3s}")
    rows = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            df.collect()  # run it: AQE finalizes the adaptive plan
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            rows.append((name, f"ERR {type(ex).__name__}"))
            continue
        # an adaptive plan's toString appends '== Initial Plan ==' —
        # keep only the final section, and don't count ReusedExchange
        # lines (they reference an exchange that ran once elsewhere)
        final = plan.split("== Initial Plan ==")[0]
        lines = [ln for ln in final.splitlines() if "ReusedExchange" not in ln]
        final = "\n".join(lines)
        rows.append(
            (
                name,
                len(re.findall(r"Exchange hashpartitioning", final)),
                len(re.findall(r"Exchange rangepartitioning", final)),
                len(re.findall(r"Exchange RoundRobin", final)),
                len(re.findall(r"Exchange SinglePartition", final)),
                len(re.findall(r"EvalPython|FlatMapGroupsInPandas|MapInPandas", final)),
            )
        )
    for r in sorted(rows, key=lambda r: (-(r[1] if len(r) > 2 else 0), r[0])):
        if len(r) == 2:
            print(f"{r[0]:42s} {r[1]}")
        else:
            print(f"{r[0]:42s} {r[1]:4d} {r[2]:4d} {r[3]:3d} {r[4]:3d} {r[5]:3d}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
