"""Relational operators: join, union, aggregate, pivot, unpivot, lookup.

Parity target: reference odibi/transformers/relational.py and the
lookup join odibi/transformers/advanced.py:1670-1798. Differences from
the reference (deliberate, Spark-first):

- Catalyst picks the join algorithm; a ``broadcast`` flag adds the hint
  for dimension lookups (the reference never hints — SURVEY §2.4).
- No eager ``df.count()`` logging (reference relational.py:86-117
  double-executes plans; forbidden at scale — SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "full",
    "outer": "full",
    "cross": "cross",
    "anti": "left_anti",
    "semi": "left_semi",
}


def _resolve_right(ctx: EngineContext, right: str | DataFrame) -> DataFrame:
    return right if isinstance(right, DataFrame) else ctx.context.get(right)


# Advisory broadcast: a user hint overrides AQE's size check, so an
# unconditional hint on a table that grows with the data (customer,
# orders, ...) becomes a driver-OOM / broadcast-timeout at 100x scale.
# Policy: honor the hint only while the optimizer's size estimate stays
# within ADVISORY_FACTOR x autoBroadcastJoinThreshold; beyond that,
# drop it and let AQE pick the join strategy from runtime sizes.
ADVISORY_BROADCAST_FACTOR = 10


def _parse_bytes(s: str | int) -> int:
    s = str(s).strip().lower()
    for suf, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suf):
            return int(float(s[: -len(suf)])) * m
    return int(float(s))


def _broadcast_bound_bytes(spark) -> int:
    try:
        n = _parse_bytes(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        n = 10 << 20
    if n <= 0:  # auto-broadcast disabled: keep hints usable but bounded
        n = 10 << 20
    return n * ADVISORY_BROADCAST_FACTOR


# Plans without stats (e.g. Scan ExistingRDD) report defaultSizeInBytes
# = Long.MaxValue; anything this large means "unknown", not "huge".
_UNKNOWN_SIZE_FLOOR = 1 << 60


def _estimated_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimizer estimate (driver-side, runs no job).
    None when unavailable or when the plan has no real stats."""
    try:
        # py4j converts the Scala BigInt to a Python int
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    return None if est >= _UNKNOWN_SIZE_FLOOR else est


def apply_broadcast_hint(
    df: DataFrame, *, proxy: DataFrame | None = None
) -> DataFrame:
    """Size-aware broadcast: hint only while the optimizer estimate is
    within the advisory bound; a confidently-large estimate drops the
    hint (AQE decides). Unknown estimates honor the user's hint — the
    guard targets the file-scan case, where stats always exist.

    ``proxy``: use THIS frame's estimate instead of ``df``'s. Catalyst
    multiplies sizes through joins, so a join output's estimate can be
    off by 6+ orders of magnitude (a dim-filtered supplier subset at
    sf0.001 estimates 4.7 GB); when ``df`` is provably a subset /
    projection of some scanned table, pass that scan as the proxy —
    its footer-derived stats are accurate and upper-bound ``df``."""
    est = _estimated_size_bytes(proxy if proxy is not None else df)
    if est is not None and est > _broadcast_bound_bytes(df.sparkSession):
        return df
    return F.broadcast(df)


@transform("join")
def join(
    ctx: EngineContext,
    *,
    right: str | DataFrame,
    on: list[str] | None = None,
    how: str = "inner",
    prefix: str | None = None,
    broadcast: bool = False,
) -> EngineContext:
    """Equi-join with collision-safe right columns.

    Reference semantics (relational.py:16-252): 7 join types; join keys
    deduped (single output key column, coalesced for right/full outer);
    colliding right columns renamed ``{prefix|right_name}_{col}``.
    """
    how_spark = _JOIN_TYPES[how]
    rdf = _resolve_right(ctx, right)
    rname = right if isinstance(right, str) else "right"
    if broadcast:
        rdf = apply_broadcast_hint(rdf)

    if how_spark == "cross":
        left_cols = set(ctx.df.columns)
        pfx = prefix or rname
        for c in rdf.columns:
            if c in left_cols:
                rdf = rdf.withColumnRenamed(c, f"{pfx}_{c}")
        return ctx.with_df(ctx.df.crossJoin(rdf))

    assert on, f"join type '{how}' requires 'on' keys"
    if how_spark in ("left_anti", "left_semi"):
        return ctx.with_df(ctx.df.join(rdf, on=on, how=how_spark))

    # Rename colliding non-key right columns before joining. Using the
    # list-of-names join form makes Spark emit ONE key column, already
    # coalesced for right/full outer joins (reference: :186-192).
    left_cols = set(ctx.df.columns)
    pfx = prefix or rname
    for c in rdf.columns:
        if c in left_cols and c not in on:
            rdf = rdf.withColumnRenamed(c, f"{pfx}_{c}")
    return ctx.with_df(ctx.df.join(rdf, on=on, how=how_spark))


@transform("union")
def union(
    ctx: EngineContext,
    *,
    others: list[str | DataFrame],
    by_name: bool = True,
    allow_missing: bool = True,
    distinct: bool = False,
) -> EngineContext:
    """UNION ALL with by-name alignment (reference: relational.py:260-381;
    the reference emulates BY NAME on Spark by projecting the left
    frame's column order :346-357 — ``unionByName`` is the native form)."""
    df = ctx.df
    for other in others:
        odf = _resolve_right(ctx, other)
        if by_name:
            df = df.unionByName(odf, allowMissingColumns=allow_missing)
        else:
            df = df.union(odf)
    if distinct:
        df = df.distinct()
    return ctx.with_df(df)


_AGG_FUNCS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "first": F.first,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev,
    "collect_set": F.collect_set,
    # exact sort-based median (Spark 3.4+): matches DuckDB median
    # bit-for-bit on doubles, unlike percentile_approx
    "median": F.median,
}


@transform("aggregate")
def aggregate(
    ctx: EngineContext,
    *,
    group_by: list[str],
    aggregations: dict[str, dict[str, str]] | list[dict[str, str]],
    having: str | None = None,
) -> EngineContext:
    """GROUP BY + named aggregates (reference: relational.py:684-770).

    ``aggregations``: {out_col: {"function": "sum", "column": "x"}} or a
    list of {"function","column","alias"} dicts. Beyond the reference's
    sum/avg/min/max/count/first we expose count_distinct /
    approx_count_distinct / stddev (SURVEY §2.5 gap note).
    """
    if isinstance(aggregations, dict):
        items = [
            {"alias": out, "function": spec["function"], "column": spec["column"]}
            for out, spec in aggregations.items()
        ]
    else:
        items = aggregations
    aggs = []
    for spec in items:
        fn = _AGG_FUNCS[spec["function"].lower()]
        col = spec["column"]
        alias = spec.get("alias") or f"{spec['function']}_{col}"
        # column may be any SQL expression (e.g. a CAST) — F.expr covers
        # the plain-column case too.
        target = F.lit(1) if col == "*" and spec["function"] == "count" else F.expr(col)
        aggs.append(fn(target).alias(alias))
    out = ctx.df.groupBy(*group_by).agg(*aggs)
    if having:
        out = out.filter(having)
    return ctx.with_df(out)


@transform("grouping_sets")
def grouping_sets(
    ctx: EngineContext,
    *,
    sets: list[list[str]],
    aggregations: list[dict[str, str]],
    having: str | None = None,
) -> EngineContext:
    """GROUP BY GROUPING SETS — native Spark/ANSI, beyond the
    reference's cube/rollup gap (SURVEY §2.5 note). Columns absent from
    a set come out NULL, exactly as in cube/rollup.

    SQL-first (the reference's operator style, sql_core.py:41-44):
    identical text runs on Spark and the DuckDB oracle.
    """
    group_cols: list[str] = []
    for s in sets:
        for c in s:
            if c not in group_cols:
                group_cols.append(c)
    aggs = ", ".join(
        f"{spec['function'].upper()}({spec['column']}) AS {spec['alias']}"
        for spec in aggregations
    )
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    sql = (
        f"SELECT {', '.join(group_cols)}, {aggs} FROM df "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )
    if having:
        sql += f" HAVING {having}"
    return ctx.sql(sql)


@transform("pivot")
def pivot(
    ctx: EngineContext,
    *,
    group_by: list[str],
    pivot_column: str,
    value_column: str,
    agg_function: str = "sum",
    values: list[str] | None = None,
) -> EngineContext:
    """groupBy(g).pivot(col[, values]).agg(f) (reference: relational.py:389-538).

    Passing ``values`` skips the extra distinct scan over the pivot
    column (reference: :407-452) — at 100 TB that scan is a full pass,
    so always provide values for wide tables.
    """
    fn = _AGG_FUNCS[agg_function.lower()]
    grouped = ctx.df.groupBy(*group_by)
    pv = grouped.pivot(pivot_column, values) if values else grouped.pivot(pivot_column)
    return ctx.with_df(pv.agg(fn(F.expr(value_column))))


@transform("unpivot")
def unpivot(
    ctx: EngineContext,
    *,
    id_columns: list[str],
    value_columns: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> EngineContext:
    """Wide -> long (reference: relational.py:546-676 via ``stack``;
    Spark >= 3.4 has native ``unpivot``/melt)."""
    return ctx.with_df(
        ctx.df.unpivot(
            ids=[F.col(c) for c in id_columns],
            values=[F.col(c) for c in value_columns],
            variableColumnName=var_name,
            valueColumnName=value_name,
        )
    )


@transform("apply_mapping")
def apply_mapping(
    ctx: EngineContext,
    *,
    mapping_table: str | DataFrame,
    key_column: str,
    mapping_key: str,
    mapping_value: str,
    output_column: str,
    default: object = None,
) -> EngineContext:
    """Lookup join with dedup-safe mapping side + COALESCE default
    (reference: advanced.py:1670-1798, dedup subquery :1747-1752).

    The mapping side is deduped with row_number()=1 then broadcast —
    a mapping table is by definition small relative to the fact side.
    """
    mdf = _resolve_right(ctx, mapping_table).select(
        F.col(mapping_key).alias("__map_key"), F.col(mapping_value).alias("__map_val")
    )
    w = Window.partitionBy("__map_key").orderBy(F.col("__map_val"))
    mdf = mdf.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")
    joined = ctx.df.join(
        apply_broadcast_hint(mdf), ctx.df[key_column] == mdf["__map_key"], "left"
    )
    out_expr = (
        F.coalesce(F.col("__map_val"), F.lit(default))
        if default is not None
        else F.col("__map_val")
    )
    return ctx.with_df(
        joined.withColumn(output_column, out_expr).drop("__map_key", "__map_val")
    )


@transform("intersect")
def intersect(ctx: EngineContext, *, other: str | DataFrame) -> EngineContext:
    """INTERSECT — reference only via raw SQL (SURVEY §2.8); native here."""
    return ctx.with_df(ctx.df.intersect(_resolve_right(ctx, other)))


@transform("except_rows")
def except_rows(
    ctx: EngineContext, *, other: str | DataFrame, bag: bool = False
) -> EngineContext:
    """EXCEPT — reference only via raw SQL (SURVEY §2.8); native here.

    Default is SQL set semantics (``subtract``): a row present in both
    sides is removed entirely. ``bag=True`` gives EXCEPT ALL
    (multiplicity-aware ``exceptAll``).
    """
    rdf = _resolve_right(ctx, other)
    return ctx.with_df(ctx.df.exceptAll(rdf) if bag else ctx.df.subtract(rdf))
