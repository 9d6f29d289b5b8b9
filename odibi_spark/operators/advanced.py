"""Scalar-function operators: keys/hashing, mapping, JSON/struct/array.

Parity target: reference odibi/transformers/advanced.py. The surrogate
and numeric key formulas are reproduced expression-for-expression —
key stability is a hard compatibility requirement (SURVEY §7.3): a
different formula would silently break every downstream join/hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform


@transform("regex_replace")
def regex_replace(
    ctx: EngineContext,
    *,
    column: str,
    pattern: str,
    replacement: str,
    output_column: str | None = None,
) -> EngineContext:
    """REGEXP_REPLACE (reference: advanced.py:284-320)."""
    out = output_column or column
    return ctx.with_df(
        ctx.df.withColumn(out, F.regexp_replace(F.col(column), pattern, replacement))
    )


@transform("hash_columns")
def hash_columns(
    ctx: EngineContext,
    *,
    columns: list[str],
    algorithm: str = "sha2",
    output_column: str = "row_hash",
    separator: str = "||",
) -> EngineContext:
    """sha2/md5 over concat of columns (reference: advanced.py:391-461)."""
    concat = F.concat_ws(
        separator, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]
    )
    if algorithm == "md5":
        expr = F.md5(concat)
    elif algorithm in ("sha2", "sha256"):
        expr = F.sha2(concat, 256)
    else:
        raise ValueError(f"unsupported hash algorithm '{algorithm}'")
    return ctx.with_df(ctx.df.withColumn(output_column, expr))


def surrogate_key_expr(columns: list[str], separator: str = "|") -> Column:
    """md5(concat_ws(sep, COALESCE(CAST(c AS STRING),'') ...)) — exact
    reference formula (advanced.py:469-526)."""
    return F.md5(
        F.concat_ws(
            separator, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]
        )
    )


@transform("generate_surrogate_key")
def generate_surrogate_key(
    ctx: EngineContext,
    *,
    columns: list[str],
    output_column: str = "surrogate_key",
    separator: str = "|",
) -> EngineContext:
    """Deterministic md5 surrogate key (reference: advanced.py:469-526)."""
    return ctx.with_df(
        ctx.df.withColumn(output_column, surrogate_key_expr(columns, separator))
    )


def numeric_key_expr(columns: list[str], separator: str = "|") -> Column:
    """CAST(CONV(SUBSTRING(md5(...),1,15),16,10) AS BIGINT) — exact
    reference formula (advanced.py:534-639, expr :601). 15 hex chars =
    60 bits, always positive, fits BIGINT."""
    md5 = surrogate_key_expr(columns, separator)
    return F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint")


@transform("generate_numeric_key")
def generate_numeric_key(
    ctx: EngineContext,
    *,
    columns: list[str],
    output_column: str = "numeric_key",
    separator: str = "|",
    existing_column: str | None = None,
) -> EngineContext:
    """Numeric surrogate key; optionally COALESCE with an existing id
    (reference: advanced.py:534-639)."""
    expr = numeric_key_expr(columns, separator)
    if existing_column:
        expr = F.coalesce(F.col(existing_column).cast("bigint"), expr)
    return ctx.with_df(ctx.df.withColumn(output_column, expr))


@transform("dict_based_mapping")
def dict_based_mapping(
    ctx: EngineContext,
    *,
    column: str,
    mapping: dict[str, object],
    output_column: str,
    default: object = None,
) -> EngineContext:
    """Literal-map lookup: create_map(...)[col] + default coalesce
    (reference: advanced.py:212-276, Spark path :250-261)."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    lookup = F.create_map(*pairs)[F.col(column)]
    if default is not None:
        lookup = F.coalesce(lookup, F.lit(default))
    return ctx.with_df(ctx.df.withColumn(output_column, lookup))


@transform("parse_json")
def parse_json(
    ctx: EngineContext,
    *,
    column: str,
    schema: str,
    output_column: str | None = None,
) -> EngineContext:
    """from_json(col, ddl_schema) (reference: advanced.py:647-703)."""
    out = output_column or f"{column}_parsed"
    return ctx.with_df(ctx.df.withColumn(out, F.from_json(F.col(column), schema)))


@transform("unpack_struct")
def unpack_struct(
    ctx: EngineContext, *, column: str, drop_source: bool = True
) -> EngineContext:
    """Expand struct fields to top level: col.* (reference:
    advanced.py:328-383)."""
    others = [c for c in ctx.df.columns if c != column]
    df = ctx.df.select(*others, f"{column}.*") if drop_source else ctx.df.select(
        "*", f"{column}.*"
    )
    return ctx.with_df(df)


@transform("normalize_json")
def normalize_json(
    ctx: EngineContext,
    *,
    column: str,
    schema: str,
    drop_source: bool = True,
) -> EngineContext:
    """parse_json + unpack in one step (reference: advanced.py:827-889)."""
    parsed = ctx.df.withColumn("__parsed", F.from_json(F.col(column), schema))
    others = [c for c in parsed.columns if c not in ("__parsed", column)]
    keep = others if drop_source else [*others, column]
    return ctx.with_df(parsed.select(*keep, "__parsed.*"))


def _flatten_fields(schema: T.StructType, prefix: str = "") -> list[tuple[str, str]]:
    """Recursive (path, flat_name) walk (reference: advanced.py:1520-1662)."""
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        path = f"{prefix}.{f.name}" if prefix else f.name
        flat = path.replace(".", "_")
        if isinstance(f.dataType, T.StructType):
            out.extend(_flatten_fields(f.dataType, path))
        else:
            out.append((path, flat))
    return out


@transform("flatten_struct")
def flatten_struct(ctx: EngineContext, *, columns: list[str] | None = None) -> EngineContext:
    """Recursively flatten struct columns into dot-path-named scalars
    (reference: advanced.py:1520-1662)."""
    df = ctx.df
    targets = set(columns) if columns else {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
    }
    select: list[Column] = []
    for f in df.schema.fields:
        if f.name in targets and isinstance(f.dataType, T.StructType):
            for path, flat in _flatten_fields(f.dataType, f.name):
                select.append(F.col(path).alias(flat))
        else:
            select.append(F.col(f.name))
    return ctx.with_df(df.select(*select))


@transform("explode_list_column")
def explode_list_column(
    ctx: EngineContext,
    *,
    column: str,
    output_column: str | None = None,
    keep_nulls: bool = False,
) -> EngineContext:
    """explode / explode_outer (reference: advanced.py:119-202).

    The keep_nulls=False path is posexplode_outer + a NULL-position
    marker filter rather than plain explode: identical semantics
    (the marker is NULL only for the empty/NULL-array row, never for
    NULL elements), but InferFiltersFromGenerate adds nothing, so
    predicate pushdown can't substitute a computed array expression
    into the scan filter (the r13 plan sweep caught split(p_name)
    being re-evaluated per row in the parquet scan filter here)."""
    out = output_column or column
    if keep_nulls:
        return ctx.with_df(
            ctx.df.withColumn(out, F.explode_outer(F.col(column)))
        )
    pos, val = "__xlc_pos", "__xlc_val"
    df = (
        ctx.df.select(
            "*", F.posexplode_outer(F.col(column)).alias(pos, val)
        )
        .filter(F.col(pos).isNotNull())
        .drop(pos)
        .withColumn(out, F.col(val))
        .drop(val)
    )
    return ctx.with_df(df)


@transform("validate_and_flag")
def validate_and_flag(
    ctx: EngineContext,
    *,
    rules: dict[str, str],
    output_column: str = "_issues",
) -> EngineContext:
    """Row-level rule flags concatenated into one column; rows are kept
    (reference: advanced.py:711-774). ``rules``: {name: sql_condition};
    a row failing ``condition`` gets ``name`` appended."""
    flags = [
        F.when(~F.expr(cond), F.lit(name)).otherwise(F.lit(None))
        for name, cond in rules.items()
    ]
    return ctx.with_df(ctx.df.withColumn(output_column, F.concat_ws(";", *flags)))


@transform("unit_convert")
def unit_convert(
    ctx: EngineContext,
    *,
    column: str,
    factor: float,
    offset: float = 0.0,
    output_column: str | None = None,
) -> EngineContext:
    """Linear unit conversion ``x*factor + offset``.

    The reference uses pint with a per-column pandas_udf (reference:
    odibi/transformers/units.py:266-326); pint is not available here and
    a linear map covers the affine conversions (incl. gauge-pressure
    offsets) without leaving codegen. Non-affine conversions would be a
    pandas_udf — see odibi_spark/llm/multimodal.py for the UDF pattern.
    """
    out = output_column or column
    return ctx.with_df(
        ctx.df.withColumn(out, F.col(column) * F.lit(factor) + F.lit(offset))
    )


@transform("geocode")
def geocode(ctx: EngineContext, **_params) -> EngineContext:
    """Geocoding stub, pass-through (reference: advanced.py:1001-1027 —
    the reference also only declares the interface). A real backend
    would be a rate-limited driver-side lookup cache joined broadcast,
    or a vendored offline geohash table."""
    import logging

    logging.getLogger(__name__).warning(
        "geocode is a stub: no geocoding performed (parity with reference)"
    )
    return ctx


@transform("cross_check")
def cross_check(
    ctx: EngineContext,
    *,
    type: str,
    inputs: list[str],
    threshold: float = 0.0,
) -> EngineContext:
    """Cross-node validation (reference: odibi/transformers/
    validation.py:14-171): compare two registered datasets by
    ``row_count_diff`` (relative diff <= threshold) or
    ``schema_match``. Raises on divergence; passes the current frame
    through unchanged (a check, not a transform)."""
    from odibi_spark.engine import cross_check_row_counts, cross_check_schema_match

    if len(inputs) != 2:
        raise ValueError(f"cross_check needs exactly 2 inputs, got {inputs}")
    a, b = (ctx.context.get(n) for n in inputs)
    if type == "row_count_diff":
        cross_check_row_counts(a, b, max_rel_diff=threshold)
    elif type == "schema_match":
        cross_check_schema_match(a, b)
    else:
        raise ValueError(
            f"unknown cross_check type '{type}' (want row_count_diff | schema_match)"
        )
    return ctx
