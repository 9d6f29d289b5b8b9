"""Typed pipeline configuration — the public YAML API surface.

Parity target (reference: odibi/config.py — ProjectConfig :5696,
PipelineConfig :5019, NodeConfig :4482, ReadConfig :2591, WriteConfig
:4163, transform steps :2791-2876). StrictModel semantics (reference
:31): unknown keys are rejected, so typos fail at parse time instead
of silently no-op'ing ("hallucinated field" detection :4901-4928).
"""

from __future__ import annotations

from typing import Any, Literal

from pydantic import BaseModel, ConfigDict, model_validator


class StrictModel(BaseModel):
    model_config = ConfigDict(extra="forbid")


class ReadConfig(StrictModel):
    format: str = "parquet"
    path: str | None = None
    table: str | None = None
    connection: str | None = None
    schema_ddl: str | None = None
    options: dict[str, Any] = {}
    filter: str | None = None
    columns: list[str] | None = None
    streaming: bool = False
    #: format: simulation — seeded synthetic source (reference
    #: SimulationConfig, odibi/config.py:1391-2432): {rows, columns,
    #: seed?, distributed?, portable_hash?} passed to
    #: sources.simulation.generate
    simulation: dict[str, Any] | None = None

    @model_validator(mode="after")
    def _path_or_table(self) -> "ReadConfig":
        if self.format.lower() == "simulation":
            sim = self.simulation
            if not sim:
                raise ValueError(
                    "format: simulation needs a 'simulation:' block "
                    "({rows, columns, ...})"
                )
            # typos fail at parse time (the file's StrictModel promise),
            # not as a KeyError mid-run
            allowed = {"rows", "columns", "seed", "distributed", "portable_hash"}
            unknown = set(sim) - allowed
            if unknown:
                raise ValueError(
                    f"unknown simulation key(s) {sorted(unknown)}; "
                    f"allowed: {sorted(allowed)}"
                )
            if not isinstance(sim.get("rows"), int) or sim["rows"] <= 0:
                raise ValueError("simulation.rows must be a positive int")
            if not isinstance(sim.get("columns"), dict) or not sim["columns"]:
                raise ValueError("simulation.columns must be a non-empty mapping")
            if self.path or self.table or self.schema_ddl or self.streaming:
                raise ValueError(
                    "format: simulation takes no path/table/schema_ddl/"
                    "streaming — it generates its frame"
                )
            return self
        if self.simulation:
            raise ValueError(
                "a 'simulation:' block requires format: simulation "
                "(it would otherwise be silently ignored)"
            )
        # pathless streaming sources (rate, kafka, socket) configure
        # themselves via options only
        pathless = self.streaming and self.format.lower() in (
            "rate", "kafka", "socket",
        )
        if not self.path and not self.table and not pathless:
            raise ValueError("read needs 'path' or 'table'")
        return self


class TransformStep(StrictModel):
    """A raw SQL step (``sql``), a SQL file (``sql_file`` — reference
    step schema config.py:2791-2876), or a named operator
    (``function`` + ``params``) — reference node.py:1879-1943."""

    sql: str | None = None
    sql_file: str | None = None
    function: str | None = None
    params: dict[str, Any] = {}

    @model_validator(mode="after")
    def _one_of(self) -> "TransformStep":
        given = sum(bool(x) for x in (self.sql, self.sql_file, self.function))
        if given != 1:
            raise ValueError(
                "step needs exactly one of 'sql', 'sql_file', or 'function'"
            )
        return self


class ValidationTest(StrictModel):
    name: str
    type: Literal[
        "not_null", "unique", "accepted_values", "range",
        "regex_match", "row_count", "custom_sql", "freshness",
    ]
    column: str | None = None
    columns: list[str] | None = None
    values: list[Any] | None = None
    min: Any | None = None
    max: Any | None = None
    pattern: str | None = None
    condition: str | None = None
    max_age_hours: int | None = None
    threshold: float = 0.0
    quarantine: bool = False

    def to_dict(self) -> dict[str, Any]:
        return {k: v for k, v in self.model_dump().items() if v is not None}


class GateConfig(StrictModel):
    require_pass_rate: float | None = None
    max_row_drop_percent: float | None = None
    mode: Literal["fail", "warn"] = "fail"


class ValidationConfig(StrictModel):
    tests: list[ValidationTest] = []
    gate: GateConfig | None = None
    quarantine_path: str | None = None


class WriteConfig(StrictModel):
    path: str | None = None
    format: str = "parquet"
    connection: str | None = None
    mode: Literal["overwrite", "append", "error", "ignore", "upsert", "append_once"] = (
        "overwrite"
    )
    keys: list[str] | None = None
    partition_by: list[str] | None = None
    coalesce_partitions: int | None = None
    sort_by: list[str] | None = None       # parquet stats clustering
    bucket_by: list[str] | None = None     # shuffle-free joins on keys
    bucket_count: int = 16
    table: str | None = None               # required for bucket_by
    options: dict[str, Any] = {}
    add_metadata: bool = False
    # content-hash change detection: skip the write when the data is
    # byte-identical to the previous run (reference: config.py:4268-4290)
    skip_if_unchanged: bool = False
    # Delta-only maintenance (reference config.py:4222-4243; executed
    # via io/delta_ops — gated on delta-spark being present)
    zorder_by: list[str] | None = None
    cluster_by: list[str] | None = None
    auto_optimize: bool = False
    vacuum_retention_hours: float | None = None
    register_as: str | None = None


class IncrementalConfig(StrictModel):
    """HWM / rolling-window incremental read filters (reference:
    odibi/config.py:2451-2588, node.py:1019-1273)."""

    mode: Literal["rolling", "stateful"] = "stateful"
    column: str = "updated_at"
    fallback_column: str | None = None
    lookback: str | None = None           # rolling: e.g. "7 days"
    watermark_lag: str | None = None      # stateful: late-data safety lag
    state_key: str | None = None
    # bootstrap override: applied instead of the full load on the first
    # run (reference write.first_run_query config.py:4247-4254; here a
    # filter expression rather than a full query — documented deviation)
    first_run_filter: str | None = None


class ContractTest(StrictModel):
    """Pre-transform circuit breakers on the INPUT (reference:
    odibi/config.py:3200-3292, executed node.py:1480-1528).

    ``distribution`` (reference DistributionContract config.py:3222)
    checks a statistical metric of a column against a threshold
    expression, e.g. ``metric: mean, threshold: ">100"`` or
    ``metric: null_percentage, threshold: "<0.05"``; ``on_fail: warn``
    logs instead of failing the node (reference ContractSeverity)."""

    name: str
    type: Literal["schema", "freshness", "row_count", "distribution"]
    columns: dict[str, str] | None = None     # schema: {col: type}
    column: str | None = None                 # freshness / distribution
    max_age_hours: int | None = None
    min: int | None = None
    max: int | None = None
    metric: Literal["mean", "min", "max", "null_percentage"] | None = None
    threshold: str | None = None              # e.g. ">100", "<=0.05"
    on_fail: Literal["fail", "warn"] = "fail"

    @model_validator(mode="after")
    def _distribution_fields(self) -> "ContractTest":
        if self.type == "distribution" and not (
            self.column and self.metric and self.threshold
        ):
            raise ValueError(
                f"contract '{self.name}': distribution needs column, metric, threshold"
            )
        return self


class PatternConfig(StrictModel):
    """Warehouse pattern step (reference: pattern dispatch
    node.py:1580-1624; patterns/base.py:13-56). ``type`` picks the
    pattern; remaining keys are its parameters (e.g. target_path, keys,
    track_cols). Self-writing patterns (scd2/merge/dimension/
    aggregation_incremental/delete_detection) maintain their own target
    and the node's output is the fresh target contents."""

    model_config = ConfigDict(extra="allow")
    type: Literal[
        "scd2", "merge", "dimension", "fact", "date_dimension",
        "aggregation_incremental", "delete_detection", "snapshot_cdc",
    ]


class PrivacyConfig(StrictModel):
    """PII protection applied after transforms, before validation/write
    (reference: per-column data dictionary PII flags odibi/config.py:
    4345-4352; privacy step in the transform phase node.py:1529-1691)."""

    pii_columns: list[str]
    method: Literal["sha256", "mask", "drop"] = "sha256"
    salt: str = ""


class NodeConfig(StrictModel):
    name: str
    depends_on: list[str] = []
    pre_sql: list[str] = []
    read: ReadConfig | None = None
    contracts: list[ContractTest] = []
    transform: list[TransformStep] = []
    pattern: PatternConfig | None = None
    privacy: PrivacyConfig | None = None
    validation: ValidationConfig | None = None
    write: WriteConfig | None = None
    post_sql: list[str] = []
    materialize_view: str | None = None
    incremental: IncrementalConfig | None = None
    state_path: str | None = None
    cache: bool = False
    retries: int = 0                      # per-node retry-with-backoff

    @model_validator(mode="after")
    def _has_source(self) -> "NodeConfig":
        generates = self.pattern is not None and self.pattern.type == "date_dimension"
        if not self.read and not self.depends_on and not generates:
            raise ValueError(f"node '{self.name}' needs 'read' or 'depends_on'")
        return self


class AlertConfig(StrictModel):
    """Alert channel subscription (reference: odibi/config.py:162-215
    AlertConfig; delivery odibi/utils/alerting.py). ``metadata`` may
    carry throttle_minutes / max_per_hour / channel."""

    type: Literal["webhook", "slack", "teams", "teams_workflow"] = "webhook"
    url: str
    on_events: list[
        Literal[
            "on_start", "on_success", "on_failure",
            "on_quarantine", "on_gate_block", "on_threshold_breach",
        ]
    ] = []
    metadata: dict[str, Any] = {}


class ConnectionConfig(StrictModel):
    """Named connection (reference: odibi/connections/factory.py).
    ``type`` selects the factory; remaining keys are its kwargs."""

    model_config = ConfigDict(extra="allow")
    type: str


class DocsOutputsConfig(StrictModel):
    readme: bool = True
    technical_details: bool = True
    node_cards: bool = True
    run_memo: bool = True


class DocsYamlConfig(StrictModel):
    """Markdown docs generation (reference: odibi/config.py:5381 DocsConfig
    nested under story:; rendered by story_docs.DocGenerator)."""

    enabled: bool = True
    output_path: str = "docs/generated"
    outputs: DocsOutputsConfig = DocsOutputsConfig()
    max_history: int = 50
    project: str | None = None


class StoryConfig(StrictModel):
    """Run-report config (reference: odibi/config.py:5343 story: block —
    HTML story path + nested docs generation)."""

    path: str | None = None        # HTML story file target
    sample_rows: int = 5
    docs: DocsYamlConfig | None = None


class PipelineConfig(StrictModel):
    name: str
    nodes: list[NodeConfig]
    max_workers: int = 4
    connections: dict[str, ConnectionConfig] = {}
    plugins: list[str] = []
    alerts: list[AlertConfig] = []
    story: StoryConfig | None = None

    @model_validator(mode="after")
    def _unique_names(self) -> "PipelineConfig":
        names = [n.name for n in self.nodes]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(f"duplicate node names: {sorted(dupes)}")
        return self


def load_pipeline_yaml(
    path_or_text: str,
    *,
    env: str | None = None,
    environment: Any | None = None,
) -> PipelineConfig:
    """Parse a pipeline YAML (path or literal text) through the full
    loader pipeline: ${VAR}/${vars.x}/${date:...} substitution,
    imports:, environments: overlays (plans/loader.py), then recipe
    expansion (plans/recipes.py), then strict validation."""
    from odibi_spark.plans.loader import load_config
    from odibi_spark.plans.recipes import resolve_recipes

    doc = load_config(path_or_text, env=env, environment=environment)
    return PipelineConfig.model_validate(resolve_recipes(doc))
