"""CLI (reference: odibi/cli/main.py:271-537 — run, plan, validate,
graph, schema): ``python -m odibi_spark.cli <cmd> pipeline.yaml``."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="odibi_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd, help_ in [
        ("run", "execute a pipeline YAML"),
        ("plan", "show execution layers without running"),
        ("validate", "parse + validate the pipeline config"),
        ("graph", "print the dependency DAG"),
    ]:
        sp = sub.add_parser(cmd, help=help_)
        sp.add_argument("pipeline", help="pipeline YAML path")
        if cmd == "run":
            sp.add_argument("--parallel", action="store_true")
            sp.add_argument("--catalog", help="catalog root for run metadata")
    args = p.parse_args(argv)

    from odibi_spark.plans.config import load_pipeline_yaml

    try:
        cfg = load_pipeline_yaml(args.pipeline)
    except Exception as ex:
        print(f"INVALID: {ex}", file=sys.stderr)
        return 2

    from odibi_spark.plans.graph import DependencyGraph

    graph = DependencyGraph({n.name: n.depends_on for n in cfg.nodes})

    if args.cmd == "validate":
        print(f"OK: {cfg.name} ({len(cfg.nodes)} nodes)")
        return 0
    if args.cmd == "graph":
        for n in cfg.nodes:
            deps = ", ".join(n.depends_on) or "-"
            print(f"{n.name} <- {deps}")
        return 0
    if args.cmd == "plan":
        for i, layer in enumerate(graph.layers()):
            print(f"layer {i}: {', '.join(layer)}")
        return 0

    # run
    from odibi_spark import get_spark
    from odibi_spark.plans.pipeline import Pipeline

    spark = get_spark(cfg.name)
    pipe = Pipeline(cfg, spark)
    if getattr(args, "catalog", None):
        from odibi_spark.catalog import Catalog, run_pipeline_with_catalog

        run_id, results = run_pipeline_with_catalog(
            pipe, catalog=Catalog(spark, args.catalog), parallel=args.parallel
        )
        print(f"run_id: {run_id}")
    else:
        results = pipe.run(parallel=args.parallel)
    summary = {k: v.status for k, v in results.items()}
    print(json.dumps(summary, indent=2))
    return 0 if all(s == "success" for s in summary.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
