"""Multi-pipeline projects with cross-pipeline node references
(reference: ProjectConfig odibi/config.py:5696; cross-pipeline
``$pipeline.node`` inputs + cycle check odibi/graph.py:159-219).

A node in one pipeline may depend on ``other_pipeline.node``. The
project runner topologically orders pipelines by those edges, shares
one Context across them, and registers every node output under the
qualified alias ``pipeline__node`` (temp-view names cannot contain
dots) in addition to its local name.
"""

from __future__ import annotations

from typing import Any

from pydantic import model_validator
from pyspark.sql import SparkSession

from odibi_spark.plans.config import ConnectionConfig, PipelineConfig, StrictModel
from odibi_spark.plans.pipeline import Pipeline
from odibi_spark.plans.node import NodeResult


def qualified(pipeline: str, node: str) -> str:
    return f"{pipeline}__{node}"


class ProjectConfig(StrictModel):
    name: str
    pipelines: list[PipelineConfig]
    connections: dict[str, ConnectionConfig] = {}
    plugins: list[str] = []

    @model_validator(mode="after")
    def _unique_pipelines(self) -> "ProjectConfig":
        names = [p.name for p in self.pipelines]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(f"duplicate pipeline names: {sorted(dupes)}")
        return self


def load_project_yaml(
    path_or_text: str,
    *,
    env: str | None = None,
    environment: Any | None = None,
) -> ProjectConfig:
    """Parse a project YAML (path or literal text) through the loader
    (env/vars/date substitution, imports, environments) and the recipe
    layer before strict validation — same pipeline as
    ``load_pipeline_yaml``."""
    from odibi_spark.plans.loader import load_config
    from odibi_spark.plans.recipes import resolve_recipes

    doc = load_config(path_or_text, env=env, environment=environment)
    return ProjectConfig.model_validate(resolve_recipes(doc))


class Project:
    """Plan + run a multi-pipeline project.

    Cross-pipeline references are node ``depends_on`` entries of the
    form ``pipeline.node``. They create pipeline-level edges (cycle
    checked, reference graph.py:159-219) and are rewritten to the
    ``pipeline__node`` alias before each pipeline's own DAG is built,
    so the intra-pipeline graph only sees local names.
    """

    def __init__(self, config: ProjectConfig, spark: SparkSession):
        self.config = config
        self.spark = spark
        known = {p.name for p in config.pipelines}
        pipe_nodes = {p.name: {n.name for n in p.nodes} for p in config.pipelines}

        # pipeline-level dependency edges from cross refs
        self.pipeline_deps: dict[str, set[str]] = {p.name: set() for p in config.pipelines}
        self._external: dict[str, set[str]] = {}
        rewritten: list[PipelineConfig] = []
        for p in config.pipelines:
            p2 = p.model_copy(deep=True)
            # merge project-level connections under pipeline-local ones
            p2.connections = {**config.connections, **p2.connections}
            p2.plugins = [*config.plugins, *p2.plugins]
            for n in p2.nodes:
                new_deps = []
                for d in n.depends_on:
                    if "." in d:
                        src_pipe, src_node = d.split(".", 1)
                        if src_pipe not in known:
                            raise ValueError(
                                f"node '{p.name}.{n.name}' references unknown "
                                f"pipeline '{src_pipe}' (known: {sorted(known)})"
                            )
                        if src_node not in pipe_nodes[src_pipe]:
                            raise ValueError(
                                f"node '{p.name}.{n.name}' references unknown "
                                f"node '{d}'"
                            )
                        if src_pipe == p.name:
                            # self-reference: just a local dependency
                            new_deps.append(src_node)
                            continue
                        self.pipeline_deps[p.name].add(src_pipe)
                        self._external.setdefault(p.name, set()).add(
                            qualified(src_pipe, src_node)
                        )
                        new_deps.append(qualified(src_pipe, src_node))
                    else:
                        new_deps.append(d)
                n.depends_on = new_deps
            rewritten.append(p2)
        self._pipelines = rewritten
        self._order = self._toposort()

    def _toposort(self) -> list[str]:
        # Kahn with cycle detection over pipeline-level edges
        deps = {k: set(v) for k, v in self.pipeline_deps.items()}
        order: list[str] = []
        ready = sorted(k for k, v in deps.items() if not v)
        while ready:
            k = ready.pop(0)
            order.append(k)
            for other, ds in deps.items():
                if k in ds:
                    ds.discard(k)
                    if not ds and other not in order and other not in ready:
                        ready.append(other)
            ready.sort()
        remaining = [k for k in deps if k not in order]
        if remaining:
            raise ValueError(
                f"cross-pipeline dependency cycle among: {sorted(remaining)}"
            )
        return order

    def plan(self) -> list[str]:
        """Pipeline execution order."""
        return list(self._order)

    def run(self, parallel: bool = False, **run_kwargs: Any) -> dict[str, dict[str, NodeResult]]:
        """Run every pipeline in dependency order over ONE shared
        Context; each node output is also registered under its
        ``pipeline__node`` alias for cross-pipeline consumers."""
        by_name = {p.name: p for p in self._pipelines}
        shared_ctx = None
        all_results: dict[str, dict[str, NodeResult]] = {}
        for pname in self._order:
            pipe = Pipeline(
                by_name[pname], self.spark,
                external_deps=self._external.get(pname, set()),
            )
            if shared_ctx is None:
                shared_ctx = pipe.context
            else:
                pipe.context = shared_ctx
            # a failed upstream pipeline skips downstream dependents
            failed_dep = next(
                (
                    d for d in self.pipeline_deps[pname]
                    if any(r.status != "success" for r in all_results.get(d, {}).values())
                ),
                None,
            )
            if failed_dep is not None:
                all_results[pname] = {
                    n.name: NodeResult(
                        name=n.name, status="skipped",
                        error=f"upstream pipeline failed: {failed_dep}",
                    )
                    for n in by_name[pname].nodes
                }
                continue
            results = pipe.run(parallel=parallel, **run_kwargs)
            for node_name, r in results.items():
                if r.status == "success" and shared_ctx.has(node_name):
                    shared_ctx.register(
                        qualified(pname, node_name), shared_ctx.get(node_name)
                    )
            all_results[pname] = results
        return all_results
