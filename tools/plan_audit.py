"""Fleet-wide physical-plan audit: exchange / single-partition /
Python-boundary counts for every declared workload.

The companion guardrail test
(tests/test_scale_plans.py::TestNoUndocumentedSinglePartition) FAILS
on undocumented single-partition stages; this tool prints the whole
table so a reviewer can see the shuffle budget per query at a glance.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, ".")
    from odibi_spark import get_spark
    from odibi_spark.workloads import QUERIES

    spark = get_spark("plan_audit")
    print(f"{'workload':42s} {'hash':>4s} {'rr':>3s} {'1p':>3s} {'py':>3s}")
    rows = []
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            rows.append((name, f"ERR {type(ex).__name__}"))
            continue
        rows.append(
            (
                name,
                len(re.findall(r"Exchange hashpartitioning", plan)),
                len(re.findall(r"Exchange RoundRobin", plan)),
                len(re.findall(r"Exchange SinglePartition", plan)),
                len(re.findall(r"EvalPython|FlatMapGroupsInPandas|MapInPandas", plan)),
            )
        )
    for r in sorted(rows, key=lambda r: (-(r[1] if len(r) > 2 else 0), r[0])):
        if len(r) == 2:
            print(f"{r[0]:42s} {r[1]}")
        else:
            print(f"{r[0]:42s} {r[1]:4d} {r[2]:3d} {r[3]:3d} {r[4]:3d}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
