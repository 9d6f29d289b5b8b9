"""Core row-level operators (projection / filter / cleanup / dates).

Parity target: the reference's sql_core transformer set (reference:
odibi/transformers/sql_core.py — 28 ops registered at
odibi/transformers/__init__.py:38-69). The reference builds SQL strings
against a ``df`` view; here each op is a declarative DataFrame
transform, so Catalyst gets the same logical plan without string
assembly, and pushdown/pruning work unchanged.

All ops: ``fn(ctx: EngineContext, **params) -> EngineContext``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F
from pyspark.sql.window import Window

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform

# Reference type alias map (odibi/transformers/sql_core.py:224-235):
# user-facing simple types normalized; raw SQL types (ARRAY<...>) pass through.
_TYPE_MAP = {
    "int": "int",
    "integer": "int",
    "str": "string",
    "string": "string",
    "float": "double",
    "double": "double",
    "bool": "boolean",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "long": "bigint",
    "bigint": "bigint",
    "decimal": "decimal(38,18)",
}


def _normalize_type(t: str) -> str:
    return _TYPE_MAP.get(t.strip().lower(), t)


@transform("filter_rows")
def filter_rows(ctx: EngineContext, *, condition: str) -> EngineContext:
    """WHERE <condition> (reference: sql_core.py:15-86)."""
    return ctx.with_df(ctx.df.filter(condition))


@transform("derive_columns")
def derive_columns(ctx: EngineContext, *, columns: dict[str, str]) -> EngineContext:
    """Add/replace columns from SQL expressions (reference: sql_core.py:94-147)."""
    return ctx.with_df(ctx.df.withColumns({c: F.expr(e) for c, e in columns.items()}))


@transform("cast_columns")
def cast_columns(ctx: EngineContext, *, columns: dict[str, str]) -> EngineContext:
    """CAST(col AS T) with simple-type aliases (reference: sql_core.py:155-252)."""
    return ctx.with_df(
        ctx.df.withColumns(
            {c: F.col(c).cast(_normalize_type(t)) for c, t in columns.items()}
        )
    )


@transform("clean_text")
def clean_text(
    ctx: EngineContext,
    *,
    columns: list[str],
    trim: bool = True,
    case: str | None = None,
) -> EngineContext:
    """TRIM / LOWER / UPPER on listed columns (reference: sql_core.py:260-299)."""
    out = {}
    for c in columns:
        col = F.col(c)
        if trim:
            col = F.trim(col)
        if case == "lower":
            col = F.lower(col)
        elif case == "upper":
            col = F.upper(col)
        out[c] = col
    return ctx.with_df(ctx.df.withColumns(out))


@transform("extract_date_parts")
def extract_date_parts(
    ctx: EngineContext,
    *,
    column: str,
    parts: list[str],
    prefix: str | None = None,
) -> EngineContext:
    """YEAR/MONTH/DAY/HOUR(col) AS {prefix}_{part} (reference: sql_core.py:307-346)."""
    fns = {
        "year": F.year,
        "month": F.month,
        "day": F.dayofmonth,
        "hour": F.hour,
        "minute": F.minute,
        "second": F.second,
        "quarter": F.quarter,
        "week": F.weekofyear,
        "dayofweek": F.dayofweek,
    }
    pre = prefix or column
    new = {f"{pre}_{p}": fns[p](F.col(column)) for p in parts}
    return ctx.with_df(ctx.df.withColumns(new))


@transform("normalize_schema")
def normalize_schema(
    ctx: EngineContext,
    *,
    rename: dict[str, str] | None = None,
    drop: list[str] | None = None,
    order: list[str] | None = None,
) -> EngineContext:
    """Rename/drop/reorder via projection (reference: sql_core.py:354-431)."""
    df = ctx.df
    if rename:
        df = df.withColumnsRenamed(rename)
    if drop:
        df = df.drop(*drop)
    if order:
        remaining = [c for c in df.columns if c not in order]
        df = df.select(*order, *remaining)
    return ctx.with_df(df)


@transform("sort")
def sort(
    ctx: EngineContext, *, columns: list[str], ascending: bool = True
) -> EngineContext:
    """ORDER BY cols, one direction for all (reference: sql_core.py:439-476)."""
    cols = [F.col(c).asc() if ascending else F.col(c).desc() for c in columns]
    return ctx.with_df(ctx.df.orderBy(*cols))


@transform("limit")
def limit(ctx: EngineContext, *, n: int, offset: int = 0) -> EngineContext:
    """LIMIT n OFFSET k (reference: sql_core.py:484-516)."""
    df = ctx.df
    if offset:
        df = df.offset(offset)
    return ctx.with_df(df.limit(n))


@transform("sample")
def sample(
    ctx: EngineContext,
    *,
    fraction: float,
    seed: int | None = None,
    portable_key: str | None = None,
) -> EngineContext:
    """Random sample. The reference's SQL path ignored the seed
    (sql_core.py:551-561); we deliberately honor it (SURVEY §7.3).

    ``portable_key`` (VERDICT r6 task 7) switches to the deterministic
    md5-fold Bernoulli sampler keyed on that column (the same unit
    used by hash_sample/split_dataset in llm/curation.py): selection
    becomes a pure function of (key, seed) — stable across runs,
    partitionings, AND engines, so it hash-matches a SQL oracle.
    Engine-native ``df.sample`` honors the seed but draws per
    partition (seed + partition index feed the RNG), so its selection
    shifts with the partitioning and can never match another engine —
    use it when you want speed and statistical (not reproducible)
    sampling."""
    if portable_key is not None:
        from odibi_spark.llm.curation import hash_sample

        return ctx.with_df(
            hash_sample(
                ctx.df, float(fraction), key_col=portable_key,
                seed=42 if seed is None else int(seed),
            )
        )
    return ctx.with_df(ctx.df.sample(fraction=fraction, seed=seed))


@transform("distinct")
def distinct(ctx: EngineContext, *, columns: list[str] | None = None) -> EngineContext:
    """SELECT DISTINCT [cols|*] (reference: sql_core.py:569-605)."""
    df = ctx.df.select(*columns) if columns else ctx.df
    return ctx.with_df(df.distinct())


@transform("fill_nulls")
def fill_nulls(ctx: EngineContext, *, values: dict[str, object]) -> EngineContext:
    """COALESCE(col, literal) per column (reference: sql_core.py:613-654)."""
    return ctx.with_df(ctx.df.fillna(values))


@transform("split_part")
def split_part(
    ctx: EngineContext,
    *,
    column: str,
    delimiter: str,
    index: int,
    output_column: str | None = None,
) -> EngineContext:
    """element_at(split(col, quote(delim)), i), 1-based
    (reference: sql_core.py:662-698)."""
    out = output_column or f"{column}_part{index}"
    expr = F.element_at(F.split(F.col(column), re.escape(delimiter)), index)
    return ctx.with_df(ctx.df.withColumn(out, expr))


@transform("date_add")
def date_add(
    ctx: EngineContext,
    *,
    column: str,
    value: int,
    unit: str = "day",
    output_column: str | None = None,
) -> EngineContext:
    """col + INTERVAL v unit -> {col}_future (reference: sql_core.py:706-735)."""
    out = output_column or f"{column}_future"
    expr = F.expr(f"`{column}` + INTERVAL {int(value)} {unit}")
    return ctx.with_df(ctx.df.withColumn(out, expr))


@transform("date_trunc")
def date_trunc(
    ctx: EngineContext,
    *,
    column: str,
    unit: str,
    output_column: str | None = None,
) -> EngineContext:
    """date_trunc('unit', col) -> {col}_trunc (reference: sql_core.py:743-771)."""
    out = output_column or f"{column}_trunc"
    return ctx.with_df(ctx.df.withColumn(out, F.date_trunc(unit, F.col(column))))


@transform("date_diff")
def date_diff(
    ctx: EngineContext,
    *,
    start_column: str,
    end_column: str,
    unit: str = "day",
    output_column: str | None = None,
) -> EngineContext:
    """Day diff via datediff; sub-day via unix_timestamp delta
    (reference: sql_core.py:779-833)."""
    out = output_column or f"diff_{unit}"
    s, e = F.col(start_column), F.col(end_column)
    if unit == "day":
        expr: Column = F.datediff(e, s)
    else:
        seconds = F.unix_timestamp(e) - F.unix_timestamp(s)
        divisor = {"hour": 3600.0, "minute": 60.0, "second": 1.0}[unit]
        expr = seconds / F.lit(divisor)
    return ctx.with_df(ctx.df.withColumn(out, expr))


@transform("case_when")
def case_when(
    ctx: EngineContext,
    *,
    conditions: list[dict[str, str]],
    default: object = None,
    output_column: str,
) -> EngineContext:
    """CASE WHEN ... THEN ... ELSE default END (reference: sql_core.py:841-883).

    ``conditions`` is a list of {"when": <sql cond>, "then": <sql expr>}.
    """
    expr: Column | None = None
    for item in conditions:
        cond = F.expr(item["when"])
        then = F.expr(str(item["then"]))
        expr = F.when(cond, then) if expr is None else expr.when(cond, then)
    assert expr is not None, "case_when requires at least one condition"
    if default is not None:
        expr = expr.otherwise(F.expr(str(default)))
    return ctx.with_df(ctx.df.withColumn(output_column, expr))


@transform("convert_timezone")
def convert_timezone(
    ctx: EngineContext,
    *,
    column: str,
    from_tz: str,
    to_tz: str,
    output_column: str | None = None,
) -> EngineContext:
    """from_utc_timestamp(to_utc_timestamp(col, src), tgt)
    (reference: sql_core.py:891-942)."""
    out = output_column or column
    expr = F.from_utc_timestamp(F.to_utc_timestamp(F.col(column), from_tz), to_tz)
    return ctx.with_df(ctx.df.withColumn(out, expr))


@transform("concat_columns")
def concat_columns(
    ctx: EngineContext,
    *,
    columns: list[str],
    separator: str = "",
    output_column: str,
) -> EngineContext:
    """concat_ws(sep, cols...) — null-skipping (reference: sql_core.py:950-984)."""
    expr = F.concat_ws(separator, *[F.col(c) for c in columns])
    return ctx.with_df(ctx.df.withColumn(output_column, expr))


@transform("select_columns")
def select_columns(ctx: EngineContext, *, columns: list[str]) -> EngineContext:
    """Whitelist projection (reference: sql_core.py:992-1012)."""
    return ctx.with_df(ctx.df.select(*columns))


@transform("drop_columns")
def drop_columns(ctx: EngineContext, *, columns: list[str]) -> EngineContext:
    """SELECT * EXCEPT (cols) (reference: sql_core.py:1020-1050)."""
    return ctx.with_df(ctx.df.drop(*columns))


@transform("rename_columns")
def rename_columns(ctx: EngineContext, *, mapping: dict[str, str]) -> EngineContext:
    """Aliased projection (reference: sql_core.py:1058-1095)."""
    return ctx.with_df(ctx.df.withColumnsRenamed(mapping))


@transform("add_prefix")
def add_prefix(
    ctx: EngineContext, *, prefix: str, columns: list[str] | None = None
) -> EngineContext:
    """Bulk rename {c} -> {prefix}{c} (reference: sql_core.py:1103-1145)."""
    target = set(columns or ctx.df.columns)
    new_names = [f"{prefix}{c}" if c in target else c for c in ctx.df.columns]
    return ctx.with_df(ctx.df.toDF(*new_names))


@transform("add_suffix")
def add_suffix(
    ctx: EngineContext, *, suffix: str, columns: list[str] | None = None
) -> EngineContext:
    """Bulk rename {c} -> {c}{suffix} (reference: sql_core.py:1153-1195)."""
    target = set(columns or ctx.df.columns)
    new_names = [f"{c}{suffix}" if c in target else c for c in ctx.df.columns]
    return ctx.with_df(ctx.df.toDF(*new_names))


@transform("normalize_column_names")
def normalize_column_names(ctx: EngineContext, *, style: str = "snake_case") -> EngineContext:
    """snake_case / lowercase / strip-specials (reference: sql_core.py:1203-1285)."""

    def normalize(name: str) -> str:
        if style == "lowercase":
            return name.lower()
        # snake_case: camelCase boundaries -> _, specials -> _, collapse
        s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name)
        s = re.sub(r"[^0-9a-zA-Z]+", "_", s)
        s = re.sub(r"_+", "_", s).strip("_").lower()
        return s

    return ctx.with_df(ctx.df.toDF(*[normalize(c) for c in ctx.df.columns]))


@transform("coalesce_columns")
def coalesce_columns(
    ctx: EngineContext,
    *,
    columns: list[str],
    output_column: str,
    drop_sources: bool = False,
) -> EngineContext:
    """COALESCE(c1, c2, ...) AS out (reference: sql_core.py:1293-1354)."""
    df = ctx.df.withColumn(output_column, F.coalesce(*[F.col(c) for c in columns]))
    if drop_sources:
        df = df.drop(*[c for c in columns if c != output_column])
    return ctx.with_df(df)


@transform("replace_values")
def replace_values(
    ctx: EngineContext, *, column: str, mapping: dict[str, object]
) -> EngineContext:
    """CASE WHEN col='old' THEN 'new' ... ELSE col END; ''-safe, NULL
    target allowed (reference: sql_core.py:1362-1464)."""
    expr: Column | None = None
    for old, new in mapping.items():
        cond = F.col(column).eqNullSafe(F.lit(old))
        val = F.lit(new)  # F.lit(None) yields NULL — allowed target
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    assert expr is not None
    return ctx.with_df(ctx.df.withColumn(column, expr.otherwise(F.col(column))))


@transform("trim_whitespace")
def trim_whitespace(
    ctx: EngineContext, *, columns: list[str] | None = None
) -> EngineContext:
    """TRIM on listed or all string columns (reference: sql_core.py:1472-1537)."""
    if columns is None:
        columns = [f.name for f in ctx.df.schema.fields if f.dataType.simpleString() == "string"]
    return ctx.with_df(ctx.df.withColumns({c: F.trim(F.col(c)) for c in columns}))


@transform("row_number")
def row_number(
    ctx: EngineContext,
    *,
    partition_by: list[str] | None = None,
    order_by: list[str],
    output_column: str = "row_num",
    descending: bool = False,
) -> EngineContext:
    """ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...)
    (reference: sql_core.py:1545-1610)."""
    order = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*(partition_by or [])).orderBy(*order)
    return ctx.with_df(ctx.df.withColumn(output_column, F.row_number().over(w)))
