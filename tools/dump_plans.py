"""Dump .explain("formatted") for named workloads to plans/<round>/
(round dir from $SPARK_GRAFT_PLANS_DIR, default r16).

Usage: python tools/dump_plans.py <suffix> <query> [query ...]
       (suffix = "before" | "after")

Writes plans/r15/<query>_<suffix>.txt. Workloads whose builder runs
driver-side actions (training loops, store writes) execute those while
the final DataFrame is constructed; the captured plan is the final
returned query, which is what the bench times end-to-end.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from odibi_spark import get_spark
    from odibi_spark.workloads import QUERIES

    spark = get_spark("dump_plans")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
