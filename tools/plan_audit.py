"""Physical-plan audit for the headline workloads: per query, count the
join strategies, shuffle exchanges, whole-stage-codegen spans, and scan
pushdown evidence in the EXECUTED (AQE-final) plan, and flag anything
that would regress at scale (sort-merge joins on dim lookups, un-pushed
filters).

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001 — plans,
not timings, are the subject).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def final_plan(df) -> str:
    """Executed plan string, final-plan section only (AQE prints the
    initial plan too, which would double-count operators)."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in s:
        s = s.split("== Initial Plan ==")[0]
    return s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from odibi_spark import get_spark
    from odibi_spark.workloads import QUERIES

    from bench import HEADLINE

    spark = get_spark("plan_audit")
    jvm = spark._jvm
    formatted = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    header = (
        f"{'query':34} {'BHJ':>3} {'SMJ':>3} {'shuffle':>7} "
        f"{'pushed':>6} {'codegen':>7}"
    )
    print(header)
    print("-" * len(header))
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        fp = df._jdf.queryExecution().explainString(formatted)
        pushed = (
            "yes"
            if "PushedFilters: [" in fp and "PushedFilters: []" not in fp
            else "-"
        )
        plan = final_plan(QUERIES[name](spark, sf_dir))
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        shuffle = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        codegen = len({seg.split(")")[0] for seg in plan.split("*(")[1:]})
        print(f"{name:34} {bhj:>3} {smj:>3} {shuffle:>7} {pushed:>6} {codegen:>7}")
        if smj:
            print(f"  ! {name}: {smj} sort-merge join(s) — check broadcast eligibility")


if __name__ == "__main__":
    main()
