"""Node lifecycle (reference: odibi/node.py:173-462 execute; phases
:222-392): read (or dependency input) -> transform chain -> validation
(+quarantine/gate) -> write -> register output in context.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from odibi_spark.context import Context, EngineContext
from odibi_spark.io import read_source, write_sink
from odibi_spark.io.write import add_write_metadata
from odibi_spark.plans.config import NodeConfig
from odibi_spark.registry import get_registry
from odibi_spark.validation import apply_gate, run_validation


@dataclass
class NodeResult:
    name: str
    status: str                      # success | failed | skipped
    rows_written: int | None = None
    error: str | None = None
    validation: list[Any] = field(default_factory=list)
    gate_warnings: list[str] = field(default_factory=list)


class NodeExecutor:
    def __init__(self, config: NodeConfig, context: Context):
        self.config = config
        self.context = context

    def execute(self) -> NodeResult:
        cfg = self.config
        spark = self.context.spark
        try:
            # ---- read phase
            if cfg.read:
                df = read_source(
                    spark,
                    format=cfg.read.format,
                    path=cfg.read.path,
                    table=cfg.read.table,
                    schema=cfg.read.schema_ddl,
                    options=cfg.read.options,
                    filter=cfg.read.filter,
                    columns=cfg.read.columns,
                    streaming=cfg.read.streaming,
                )
            else:
                df = self.context.get(cfg.depends_on[0])

            # ---- transform chain
            ec = EngineContext(self.context, df)
            registry = get_registry()
            for step in cfg.transform:
                if step.sql:
                    ec = ec.sql(step.sql)
                else:
                    ec = registry.apply(step.function, ec, step.params)
            df = ec.df

            # ---- validation phase
            val_results: list[Any] = []
            gate_warnings: list[str] = []
            if cfg.validation and cfg.validation.tests:
                outcome = run_validation(
                    df, [t.to_dict() for t in cfg.validation.tests]
                )
                val_results = outcome.results
                if outcome.quarantined_rows is not None and cfg.validation.quarantine_path:
                    write_sink(
                        outcome.quarantined_rows,
                        path=cfg.validation.quarantine_path,
                        mode="append",
                    )
                df = outcome.valid_rows
                if cfg.validation.gate:
                    g = cfg.validation.gate
                    gate_warnings = apply_gate(
                        outcome,
                        require_pass_rate=g.require_pass_rate,
                        mode=g.mode,
                    )
                hard_fails = [
                    r for r in val_results if not r.passed and not r.quarantine
                ]
                if hard_fails and not cfg.validation.gate:
                    names = ", ".join(r.name for r in hard_fails)
                    raise ValueError(f"validation failed: {names}")

            if cfg.cache:
                df = df.cache()

            # ---- write phase
            rows_written = None
            if cfg.write:
                w = cfg.write
                out = add_write_metadata(df) if w.add_metadata else df
                write_sink(
                    out,
                    path=w.path,
                    format=w.format,
                    mode=w.mode,
                    keys=w.keys,
                    partition_by=w.partition_by,
                    coalesce_partitions=w.coalesce_partitions,
                    options=w.options,
                )

            # ---- register output for downstream nodes
            self.context.register(cfg.name, df)
            return NodeResult(
                name=cfg.name, status="success", rows_written=rows_written,
                validation=val_results, gate_warnings=gate_warnings,
            )
        except Exception as ex:  # noqa: BLE001 — node failures are data
            return NodeResult(name=cfg.name, status="failed", error=f"{type(ex).__name__}: {ex}")
