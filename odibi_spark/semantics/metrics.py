"""Semantic model: metrics and dimensions over a source table
(reference: odibi/semantics/metrics.py:34-286).

- simple metric: an aggregate SQL expression (``SUM(total_amount)``)
- derived metric: a formula over other metrics (``(a - b) / a``) —
  component expressions are inlined and divisors NULLIF-guarded at SQL
  generation time (reference: odibi/semantics/query.py:233-290)
- dimension: a column or expression, optionally with a time ``grain``
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Metric:
    name: str
    expr: str | None = None          # simple: aggregate SQL
    formula: str | None = None       # derived: formula over metric names
    description: str = ""

    def __post_init__(self) -> None:
        if bool(self.expr) == bool(self.formula):
            raise ValueError(f"metric '{self.name}' needs exactly one of expr/formula")


@dataclass
class Dimension:
    name: str
    column: str | None = None        # defaults to name
    expr: str | None = None
    grain: str | None = None         # time grain: day/week/month/quarter/year

    def sql(self) -> str:
        base = self.expr or self.column or self.name
        if self.grain:
            return f"date_trunc('{self.grain}', {base})"
        return base


@dataclass
class SemanticModel:
    source: str                      # table/view name
    metrics: dict[str, Metric] = field(default_factory=dict)
    dimensions: dict[str, Dimension] = field(default_factory=dict)

    def add_metric(self, m: Metric) -> "SemanticModel":
        self.metrics[m.name] = m
        return self

    def add_dimension(self, d: Dimension) -> "SemanticModel":
        self.dimensions[d.name] = d
        return self

    @classmethod
    def from_dict(cls, doc: dict) -> "SemanticModel":
        """YAML/JSON-friendly construction (the MCP gateway's input
        shape)::

            {source: sales,
             metrics: {revenue: {expr: "sum(amount)"},
                       aov: {formula: "revenue / orders"}},
             dimensions: {day: {column: ts, grain: day}}}
        """
        m = cls(source=doc["source"])
        for name, spec in (doc.get("metrics") or {}).items():
            spec = {"expr": spec} if isinstance(spec, str) else dict(spec)
            m.add_metric(Metric(name=name, **spec))
        for name, spec in (doc.get("dimensions") or {}).items():
            spec = {"column": spec} if isinstance(spec, str) else dict(spec)
            m.add_dimension(Dimension(name=name, **spec))
        return m
