"""Window-function and time-series operators.

Parity target: reference odibi/transformers/advanced.py window ops
(window_calculation :782-819, deduplicate :16-111, sessionize
:897-993, split_events_by_period :1035-1512) — all expressed with
``pyspark.sql.Window`` / ``sequence``+``explode`` so the work stays in
whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.window import Window

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform

_WINDOW_FUNCS = {
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "count": lambda c: F.count(c),
    "rank": lambda c: F.rank(),
    "dense_rank": lambda c: F.dense_rank(),
    "row_number": lambda c: F.row_number(),
    "lag": lambda c: F.lag(c),
    "lead": lambda c: F.lead(c),
    "first": lambda c: F.first(c),
    "last": lambda c: F.last(c),
    "cume_dist": lambda c: F.cume_dist(),
    "percent_rank": lambda c: F.percent_rank(),
}
# (ntile takes the bucket count, not a column — it is special-cased in
# window_calculation via the ``ntile_buckets`` param, not listed here)


@transform("window_calculation")
def window_calculation(
    ctx: EngineContext,
    *,
    function: str,
    column: str | None = None,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    output_column: str,
    descending: bool = False,
    frame: str | None = None,
    frame_start: int | None = None,
    frame_end: int | None = None,
    ntile_buckets: int = 10,
    distributed: bool = False,
) -> EngineContext:
    """<func>(col) OVER (PARTITION BY .. ORDER BY ..) (reference:
    advanced.py:782-819). The reference supports no explicit frame
    spec; ``frame``/``frame_start``/``frame_end`` add rows/range frames
    (SURVEY §2.6 noted gap). ``function="ntile"`` buckets rows into
    ``ntile_buckets`` equal-sized tiles.

    ``distributed=True`` is the 100-TB scale path for the
    unpartitioned rank family (row_number/rank/dense_rank/
    percent_rank/cume_dist/ntile with no ``partition_by``): instead of
    the plain global window — which Spark executes as an
    ``Exchange SinglePartition`` + one-task sort — it routes through
    :func:`odibi_spark.operators.rank.global_ranks`, the two-pass
    range-partitioned rank with identical output. When ranking several
    columns over the same order, call the ``global_rank`` transform
    directly so they share one pass."""
    if distributed:
        from odibi_spark.operators.rank import RANK_FUNCTIONS, global_ranks

        fn_name = function.lower()
        if partition_by or fn_name not in RANK_FUNCTIONS:
            raise ValueError(
                "distributed=True applies to unpartitioned rank-family "
                f"windows only (got function={function!r}, "
                f"partition_by={partition_by!r})"
            )
        if not order_by:
            raise ValueError("distributed rank requires order_by")
        spec: dict[str, object] = {"function": fn_name}
        if fn_name == "ntile":
            spec["buckets"] = int(ntile_buckets)
        return ctx.with_df(
            global_ranks(
                ctx.df,
                order_by=list(order_by),
                columns={output_column: spec},
                descending=descending,
            )
        )
    w = Window.partitionBy(*(partition_by or []))
    if order_by:
        cols = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
        w = w.orderBy(*cols)
    if frame:
        lo = Window.unboundedPreceding if frame_start is None else frame_start
        hi = Window.currentRow if frame_end is None else frame_end
        w = w.rowsBetween(lo, hi) if frame == "rows" else w.rangeBetween(lo, hi)
    if function.lower() == "ntile":
        return ctx.with_df(
            ctx.df.withColumn(
                output_column, F.ntile(int(ntile_buckets)).over(w)
            )
        )
    fn = _WINDOW_FUNCS[function.lower()]
    # column may be any SQL expression (e.g. a CAST) — F.expr covers
    # the plain-column case too.
    target: Column = F.expr(column) if column else F.lit(1)
    return ctx.with_df(ctx.df.withColumn(output_column, fn(target).over(w)))


@transform("deduplicate")
def deduplicate(
    ctx: EngineContext,
    *,
    keys: list[str],
    order_by: list[str] | None = None,
    descending: bool = True,
) -> EngineContext:
    """Keep 1 row per key: ROW_NUMBER() OVER (PARTITION BY keys ORDER BY
    order_by) = 1 (reference: advanced.py:16-111, SQL :78-84).

    The reference warns and picks arbitrarily without order_by; we pin
    deterministic semantics by ordering over all non-key columns when
    order_by is omitted (SURVEY §7.3 non-determinism trap).
    """
    order_cols = order_by or [c for c in ctx.df.columns if c not in keys]
    order = [F.col(c).desc() if descending else F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return ctx.with_df(
        ctx.df.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")
    )


@transform("sessionize")
def sessionize(
    ctx: EngineContext,
    *,
    partition_by: list[str],
    timestamp_column: str,
    gap_minutes: float = 30.0,
    session_column: str = "session_id",
    keep_helper_columns: bool = False,
    tiebreak_columns: list[str] | None = None,
) -> EngineContext:
    """Gap-based sessionization (reference: advanced.py:897-993):
    LAG(ts) per entity -> new-session flag when gap > threshold ->
    running SUM -> ``{entity}-{n}`` session id. One shuffle on the
    partition keys; both windows share it.

    Unlike the reference's Spark path (:956-958) the ``_prev_ts`` /
    ``_is_new_session`` helper columns are dropped unless requested.
    """
    ts = F.col(timestamp_column)
    order = [ts, *[F.col(c) for c in (tiebreak_columns or [])]]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prev = F.lag(ts).over(w)
    gap_sec = F.unix_timestamp(ts) - F.unix_timestamp(prev)
    is_new = F.when(
        prev.isNull() | (gap_sec > F.lit(gap_minutes * 60.0)), F.lit(1)
    ).otherwise(F.lit(0))
    df = ctx.df.withColumn("_prev_ts", prev).withColumn("_is_new_session", is_new)
    run = F.sum("_is_new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    key = F.concat_ws("-", *[F.col(c).cast("string") for c in partition_by])
    df = df.withColumn(session_column, F.concat_ws("-", key, run.cast("string")))
    if not keep_helper_columns:
        df = df.drop("_prev_ts", "_is_new_session")
    return ctx.with_df(df)


@transform("split_events_by_period")
def split_events_by_period(
    ctx: EngineContext,
    *,
    start_column: str,
    end_column: str,
    period: str = "day",
    shift_boundaries: list[str] | None = None,
    duration_column: str = "duration_minutes",
) -> EngineContext:
    """Split [start,end] interval events at day/hour/shift boundaries
    (reference: advanced.py:1035-1512; day :1125-1264, hour :1267-1384,
    shift :1387-1512).

    Implementation: ``explode(sequence(trunc(start), trunc(end), step))``
    generates one row per touched period, then GREATEST/LEAST clamp the
    segment to the event bounds and the duration is recomputed. This is
    all codegen'd builtins — scales linearly with output rows.
    """
    s, e = F.col(start_column), F.col(end_column)
    if period == "day":
        seq = F.sequence(
            F.date_trunc("day", s), F.date_trunc("day", e), F.expr("INTERVAL 1 DAY")
        )
    elif period == "hour":
        seq = F.sequence(
            F.date_trunc("hour", s), F.date_trunc("hour", e), F.expr("INTERVAL 1 HOUR")
        )
    elif period == "shift":
        return _split_by_shift(
            ctx, start_column, end_column, shift_boundaries, duration_column
        )
    else:
        raise ValueError(f"unsupported period '{period}'")

    step = "1 DAY" if period == "day" else "1 HOUR"
    df = ctx.df.withColumn("__period_start", F.explode(seq))
    period_end = F.col("__period_start") + F.expr(f"INTERVAL {step}")
    seg_start = F.greatest(s, F.col("__period_start"))
    seg_end = F.least(e, period_end)
    df = (
        df.withColumn("segment_start", seg_start)
        .withColumn("segment_end", seg_end)
        .withColumn(
            duration_column,
            (F.unix_timestamp(seg_end) - F.unix_timestamp(seg_start)) / 60.0,
        )
        .filter(F.col(duration_column) > 0)
        .withColumnRenamed("__period_start", "period_start")
    )
    return ctx.with_df(df)


def _split_by_shift(
    ctx: EngineContext,
    start_column: str,
    end_column: str,
    boundaries: list[str] | None,
    duration_column: str,
) -> EngineContext:
    """Shift splitting (reference: advanced.py:1387-1512): split each
    event at every shift boundary crossing, including overnight shifts.

    Strategy: explode the event across the hours it touches, label each
    hour with its shift (the shift whose start is the latest boundary
    <= hour-of-day, wrapping for overnight), then re-aggregate
    contiguous same-shift hours via (day, shift) grouping.
    """
    bounds = sorted(int(b.split(":")[0]) for b in (boundaries or ["06:00", "14:00", "22:00"]))
    s, e = F.col(start_column), F.col(end_column)
    df = ctx.df.withColumn(
        "__h",
        F.explode(
            F.sequence(F.date_trunc("hour", s), F.date_trunc("hour", e), F.expr("INTERVAL 1 HOUR"))
        ),
    )
    hour = F.hour("__h")
    # shift index = largest i with bounds[i] <= hour; hours before the
    # first boundary belong to the previous day's last (overnight) shift.
    expr: Column | None = None
    for i in range(len(bounds) - 1, -1, -1):
        cond = hour >= F.lit(bounds[i])
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    assert expr is not None
    df = df.withColumn("__shift", expr.otherwise(F.lit(len(bounds) - 1)))
    # shift_day: overnight hours before the first boundary belong to the
    # previous day's last shift (reference: overnight handling :1387-1446)
    df = df.withColumn(
        "__shift_day",
        F.when(hour < F.lit(bounds[0]), F.date_sub(F.to_date("__h"), 1)).otherwise(
            F.to_date("__h")
        ),
    )
    seg_start = F.greatest(s, F.col("__h"))
    seg_end = F.least(e, F.col("__h") + F.expr("INTERVAL 1 HOUR"))
    df = df.withColumn("__seg_min", (F.unix_timestamp(seg_end) - F.unix_timestamp(seg_start)) / 60.0)
    df = df.filter(F.col("__seg_min") > 0)
    group_cols = [c for c in ctx.df.columns] + ["__shift_day", "__shift"]
    out = (
        df.groupBy(*group_cols)
        .agg(
            F.min(seg_start).alias("segment_start"),
            F.max(seg_end).alias("segment_end"),
            F.sum("__seg_min").alias(duration_column),
        )
        .withColumnRenamed("__shift_day", "shift_day")
        .withColumnRenamed("__shift", "shift_index")
    )
    return ctx.with_df(out)


@transform("top_k_per_group")
def top_k_per_group(
    ctx: EngineContext,
    *,
    partition_by: list[str],
    order_by: list[str],
    k: int,
    descending: bool = True,
) -> EngineContext:
    """Top-K per group — row_number over window + filter <= k.
    Beyond-reference convenience (SURVEY §2.6 has only row_number)."""
    order = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return ctx.with_df(
        ctx.df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")
    )


def resample_frames(
    df,
    *,
    group_by: list[str],
    timestamp_column: str,
    interval_seconds: int,
    aggregations: dict[str, str],
    fill_columns: list[str] = (),
    fill: str = "ffill",
    bucket_column: str = "bucket_ts",
    gap_column: str = "is_gap",
):
    """Resample an event series onto a regular time grid with gap fill
    — the §2.6 time-series gap the operator set lacked (the reference
    has no resampler either; split_events_by_period is the closest).

    Steps (all codegen'd builtins, no Python in the hot path):
    1. bucket = floor(epoch/interval)*interval, then ONE groupBy
       (group_by, bucket) computing ``aggregations`` (SQL agg exprs)
       with map-side partials;
    2. per-group [min,max] bucket bounds (re-aggregates the already
       bucketed frame — O(groups) rows out);
    3. the dense grid is explode(sequence(min, max, interval)) FROM
       the bounds row — each group generates only its own span, never
       a global calendar cross join;
    4. grid left-joins the bucketed aggregates on (group, bucket) —
       both sides hash-partition on the same keys;
    5. ``fill="ffill"`` forward-fills ``fill_columns`` with
       last(ignorenulls) over a per-group window ordered by bucket
       (appending ``_ffill``); ``fill="zero"`` coalesces to 0
       (appending ``_filled``); ``fill="linear"`` interpolates between
       the surrounding anchors (appending ``_interp``: gaps between
       two observed buckets are linear in bucket time, gaps before the
       first observation stay null, gaps after the last carry it
       forward); ``fill="none"`` leaves gaps null.

    ``gap_column`` flags grid buckets with no source rows, from an
    INTERNAL row count — a caller aggregation that is legitimately
    null for a present bucket cannot mislabel it.

    Scale: output is span/interval rows per group; the window in step
    5 shuffles once on group_by. A single group with a multi-year span
    at 1s granularity is the skew case — size interval_seconds to the
    retention window, or pre-split such groups.
    """
    ival = int(interval_seconds)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(timestamp_column)) / F.lit(ival)) * ival
    )
    # internal row count drives the gap flag — a caller aggregation
    # like avg(v) is legitimately NULL for a present bucket whose
    # values are all null, and must not mislabel it as a gap
    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.expr(e).alias(n) for n, e in aggregations.items()
    ]
    b = df.groupBy(*group_by, bucket.alias(bucket_column)).agg(*aggs)
    bounds = b.groupBy(*group_by).agg(
        F.min(bucket_column).alias("__mn"), F.max(bucket_column).alias("__mx")
    )
    grid = bounds.select(
        *group_by,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"INTERVAL {ival} SECOND"))
        ).alias(bucket_column),
    )
    out = grid.join(b, [*group_by, bucket_column], "left")
    out = out.withColumn(gap_column, F.col("__cnt").isNull()).drop("__cnt")
    if fill == "ffill":
        w = (
            Window.partitionBy(*group_by)
            .orderBy(bucket_column)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in fill_columns:
            out = out.withColumn(
                f"{c}_ffill", F.last(c, ignorenulls=True).over(w)
            )
    elif fill == "zero":
        for c in fill_columns:
            out = out.withColumn(f"{c}_filled", F.coalesce(F.col(c), F.lit(0)))
    elif fill == "linear":
        # anchors: the previous/next OBSERVED (value, bucket) pair per
        # row — two frames over the SAME per-group partitioning, so
        # everything after the grid join stays in one shuffle
        back = (
            Window.partitionBy(*group_by)
            .orderBy(bucket_column)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fwd = (
            Window.partitionBy(*group_by)
            .orderBy(bucket_column)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        t = F.unix_timestamp(bucket_column).cast("double")
        for c in fill_columns:
            obs_t = F.when(F.col(c).isNotNull(), t)
            pv = F.last(c, ignorenulls=True).over(back)
            pt = F.last(obs_t, ignorenulls=True).over(back)
            nv = F.first(c, ignorenulls=True).over(fwd)
            nt = F.first(obs_t, ignorenulls=True).over(fwd)
            interp = (
                F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
                # between two anchors: linear in bucket time
                .when(
                    pv.isNotNull() & nv.isNotNull(),
                    pv + (nv - pv) * (t - pt) / (nt - pt),
                )
                # after the last anchor: carry forward; before the
                # first: stays null
                .otherwise(pv)
            )
            out = out.withColumn(f"{c}_interp", interp)
    elif fill != "none":
        raise ValueError(f"unsupported fill '{fill}'")
    return out


@transform("resample_timeseries")
def resample_timeseries(
    ctx: EngineContext,
    *,
    group_by: list[str],
    timestamp_column: str,
    interval_seconds: int,
    aggregations: dict[str, str],
    fill_columns: list[str] = (),
    fill: str = "ffill",
    bucket_column: str = "bucket_ts",
    gap_column: str = "is_gap",
) -> EngineContext:
    """YAML-pipeline surface for :func:`resample_frames`."""
    return ctx.with_df(
        resample_frames(
            ctx.df,
            group_by=group_by,
            timestamp_column=timestamp_column,
            interval_seconds=interval_seconds,
            aggregations=aggregations,
            fill_columns=fill_columns,
            fill=fill,
            bucket_column=bucket_column,
            gap_column=gap_column,
        )
    )
