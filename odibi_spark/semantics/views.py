"""Semantic view DDL renderer for external warehouses.

Parity target (reference: odibi/semantics/views.py — ViewGenerator
:54, generate_view_ddl :89, GRAIN_SQL_MAP :64, NULLIF guarding :253,
ensure-schema :30). The Spark engine materializes semantic queries as
Spark views (semantics/query.py:105); this module renders the SAME
semantic model as warehouse DDL text (T-SQL or ANSI) so downstream
BI warehouses can host the view without Spark in the loop.

Pure text generation — no connections, no execution. Deterministic
output (stable ordering) so golden-text tests pin the rendering.
"""

from __future__ import annotations

from odibi_spark.semantics.metrics import Dimension, SemanticModel
from odibi_spark.semantics.query import _nullif_divisors

# time-grain rendering per dialect (reference GRAIN_SQL_MAP views.py:64
# uses SQL Server DATETRUNC; ANSI/Spark/DuckDB use date_trunc('g', col))
_GRAINS = ("day", "week", "month", "quarter", "year")


def _grain_sql(dialect: str, grain: str, col: str) -> str:
    if grain not in _GRAINS:
        raise ValueError(f"unknown time grain '{grain}' (want one of {_GRAINS})")
    if dialect == "tsql":
        return f"DATETRUNC({grain}, {col})"
    return f"DATE_TRUNC('{grain}', {col})"


def _quote(dialect: str, ident: str) -> str:
    return f"[{ident}]" if dialect == "tsql" else f'"{ident}"'


def ensure_schema_sql(schema: str, dialect: str = "tsql") -> str:
    """Schema-creation preamble (reference views.py:30-42). T-SQL needs
    the conditional EXEC dance; ANSI has IF NOT EXISTS."""
    if dialect == "tsql":
        return (
            f"IF NOT EXISTS (SELECT 1 FROM sys.schemas WHERE name = '{schema}')\n"
            f"BEGIN\n    EXEC('CREATE SCHEMA [{schema}]')\nEND"
        )
    return f"CREATE SCHEMA IF NOT EXISTS {_quote(dialect, schema)}"


def render_view_ddl(
    model: SemanticModel,
    *,
    view_name: str,
    metrics: list[str],
    dimensions: list[str] | None = None,
    where: str | None = None,
    schema: str | None = None,
    dialect: str = "tsql",
    description: str = "",
) -> str:
    """CREATE-view DDL for a semantic selection (reference
    views.py:89-229):

    - simple metrics render as their aggregate expr aliased to the
      metric name
    - derived metrics inline their component aggregates into the
      formula (aggregate-then-divide, never divide-per-row) with
      NULLIF-guarded divisors
    - dimensions with a time grain render through the dialect's
      date-trunc form and appear in both SELECT and GROUP BY
    - a documentation header lists every metric with its description
    """
    if dialect not in ("tsql", "ansi"):
        raise ValueError(f"unknown dialect '{dialect}' (want 'tsql' or 'ansi')")
    dimensions = dimensions or []
    for m in metrics:
        if m not in model.metrics:
            raise ValueError(f"unknown metric '{m}'")
    for d in dimensions:
        if d not in model.dimensions:
            raise ValueError(f"unknown dimension '{d}'")

    dim_select, group_by = [], []
    for d in dimensions:
        dim = model.dimensions[d]
        base = dim.expr or dim.column or dim.name
        sql = _grain_sql(dialect, dim.grain, base) if dim.grain else base
        dim_select.append(f"    {sql} AS {d}")
        group_by.append(sql)

    met_select = []
    for m in metrics:
        met = model.metrics[m]
        if met.expr:
            met_select.append(f"    {met.expr} AS {m}")
        else:
            formula = met.formula
            # inline component metric exprs, longest name first so a
            # metric named 'revenue' doesn't clobber 'net_revenue'
            for name in sorted(model.metrics, key=len, reverse=True):
                comp = model.metrics[name]
                if comp.expr and name in formula:
                    formula = formula.replace(name, f"({comp.expr})")
            met_select.append(f"    {_nullif_divisors(formula)} AS {m}")

    qname = (
        f"{_quote(dialect, schema)}.{_quote(dialect, view_name)}"
        if schema
        else _quote(dialect, view_name)
    )
    header_lines = [f"-- View: {view_name}"]
    if description:
        header_lines.append(f"-- {description}")
    header_lines.append(f"-- Source: {model.source}")
    for m in metrics:
        met = model.metrics[m]
        desc = f" — {met.description}" if met.description else ""
        kind = "derived" if met.formula else "simple"
        header_lines.append(f"--   metric {m} ({kind}){desc}")
    header = "\n".join(header_lines)

    create = (
        f"CREATE OR ALTER VIEW {qname} AS"
        if dialect == "tsql"
        else f"CREATE OR REPLACE VIEW {qname} AS"
    )
    lines = [header, create, "SELECT"]
    lines.append(",\n".join(dim_select + met_select))
    lines.append(f"FROM {model.source}")
    if where:
        lines.append(f"WHERE {where}")
    if group_by:
        lines.append("GROUP BY " + ", ".join(group_by))
    return "\n".join(lines) + "\n"


def render_all_views(
    model: SemanticModel,
    views: list[dict],
    *,
    dialect: str = "tsql",
    schema: str | None = None,
) -> dict[str, str]:
    """Render a batch of view specs (reference execute_all_views
    views.py:373): each spec is {name, metrics, dimensions?, where?,
    description?}. Returns {view_name: ddl}."""
    return {
        v["name"]: render_view_ddl(
            model,
            view_name=v["name"],
            metrics=v["metrics"],
            dimensions=v.get("dimensions"),
            where=v.get("where"),
            schema=schema,
            dialect=dialect,
            description=v.get("description", ""),
        )
        for v in views
    }
