"""As-of and range joins — operators Spark lacks natively.

The reference has neither (SURVEY §2.4 "Not implemented: theta/range/
as-of joins"); they are standard time-series primitives, so the
rebuild provides them Spark-first:

- as-of join: for each left row, the single right row with the
  largest right-time <= left-time (optionally within a tolerance and
  per partition key). Implemented as union + window (last_value over
  ordered union) — one shuffle on (keys, time), no range explosion,
  no Python. This is the classic distributed merge_asof formulation.
- range join: equi-keys + numeric/time interval overlap, implemented
  with bucketized band join: coarse bucket equi-join prunes the cross
  product, exact predicate filters, so Catalyst gets an equi-join
  shape instead of a BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform


def asof_join_frames(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """merge_asof semantics: match each left row to the nearest right
    row at-or-before (backward) / at-or-after (forward) on ``on``,
    within optional ``tolerance``, per ``by`` group.

    Union-window plan: tag rows by side, sort by (by, on, side-order),
    carry the last-seen right payload forward with last_value(ignore
    nulls). Ties on ``on``: right row sorts first, so a simultaneous
    right row matches (pandas merge_asof parity).
    """
    by = by or []
    rcols = [c for c in right.columns if c != on and c not in by]
    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__r_on", F.lit(None).cast(right.schema[on].dataType))
    r_tag = right.select(
        *by,
        F.col(on),
        *[F.col(c) for c in rcols],
        F.lit(0).alias("__side"),
        F.col(on).alias("__r_on"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in rcols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    if direction == "backward":
        order = [F.col(on).asc(), F.col("__side").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    elif direction == "forward":
        order = [F.col(on).desc(), F.col("__side").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:
        raise ValueError(f"unknown direction '{direction}'")
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(*frame)

    carried = unioned
    for c in rcols:
        carried = carried.withColumn(
            f"__carry_{c}", F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    carried = carried.withColumn(
        "__carry_on", F.last(F.when(F.col("__side") == 0, F.col("__r_on")), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)

    keep: Column = F.lit(True)
    if tolerance:
        delta = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            keep = F.col("__carry_on") >= F.col(on) - delta
        else:
            keep = F.col("__carry_on") <= F.col(on) + delta
    sel = [F.col(c) for c in left.columns]
    for c in rcols:
        sel.append(
            F.when(keep, F.col(f"__carry_{c}")).alias(f"{right_prefix}{c}")
        )
    sel.append(F.when(keep, F.col("__carry_on")).alias(f"{right_prefix}{on}"))
    return out.select(*sel)


@transform("asof_join")
def asof_join(
    ctx: EngineContext,
    *,
    right: str | DataFrame,
    on: str,
    by: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> EngineContext:
    rdf = right if isinstance(right, DataFrame) else ctx.context.get(right)
    return ctx.with_df(
        asof_join_frames(
            ctx.df, rdf, on=on, by=by, tolerance=tolerance,
            direction=direction, right_prefix=right_prefix,
        )
    )


def range_join_frames(
    left: DataFrame,
    right: DataFrame,
    *,
    left_point: str,
    right_start: str,
    right_end: str,
    keys: list[str] | None = None,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """point-in-interval join: left.point in [right.start, right.end).

    With ``bucket_width`` (seconds for timestamps, units for numerics),
    both sides are exploded/assigned to coarse buckets and equi-joined
    on (keys, bucket) before the exact predicate — turning an O(n*m)
    nested-loop into a shuffle join. Intervals spanning B buckets
    produce B bucket rows (choose bucket_width ~ median interval).
    """
    keys = keys or []
    is_ts = dict(left.dtypes)[left_point] in ("timestamp", "timestamp_ntz")

    def bucket_of(col: Column) -> Column:
        c = F.unix_timestamp(col) if is_ts else col
        return F.floor(c / F.lit(bucket_width)).cast("long")

    exact = (
        (F.col(f"l.{left_point}") >= F.col(f"r.{right_start}"))
        & (F.col(f"l.{left_point}") < F.col(f"r.{right_end}"))
    )
    key_cond = F.lit(True)
    for k in keys:
        key_cond = key_cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    if not bucket_width:
        return left.alias("l").join(right.alias("r"), key_cond & exact, how)

    lb = left.withColumn("__bucket", bucket_of(F.col(left_point)))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket_of(F.col(right_start)), bucket_of(F.col(right_end)))
        ),
    )
    cond = (F.col("l.__bucket") == F.col("r.__bucket")) & key_cond & exact
    out = lb.alias("l").join(rb.alias("r"), cond, how)
    return out.drop("__bucket")
