"""Date-dimension pattern (reference: odibi/patterns/date_dimension.py:50-469,
Spark generation :323-413): calendar from start to end with date key,
calendar parts, fiscal year/quarter (configurable fiscal start month),
weekend flag, optional unknown member row.

Spark-first: ``sequence(to_date(start), to_date(end)) -> explode`` plus
date functions — pure codegen, no driver loop, scales to any range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_date_dimension(
    spark: SparkSession,
    *,
    start_date: str,
    end_date: str,
    fiscal_start_month: int = 1,
    include_unknown_member: bool = False,
) -> DataFrame:
    df = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start_date)),
                F.to_date(F.lit(end_date)),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    m = F.month("d")
    y = F.year("d")
    fsm = F.lit(fiscal_start_month)
    out = df.select(
        (y * 10000 + m * 100 + F.dayofmonth("d")).cast("int").alias("date_key"),
        F.col("d").alias("date"),
        y.alias("year"),
        m.alias("month"),
        F.dayofmonth("d").alias("day"),
        F.quarter("d").alias("quarter"),
        # ISO weekday: Monday=1..Sunday=7 (Spark weekday() is Monday=0)
        (F.weekday("d") + 1).alias("iso_weekday"),
        F.when(F.weekday("d") + 1 >= 6, F.lit(1)).otherwise(F.lit(0)).alias("is_weekend"),
        F.when(m >= fsm, y + 1).otherwise(y).cast("int").alias("fiscal_year")
        if fiscal_start_month > 1
        else y.alias("fiscal_year"),
        F.expr(
            f"CAST(((month(d) + 12 - {fiscal_start_month}) % 12) DIV 3 + 1 AS INT)"
        ).alias("fiscal_quarter"),
    )
    if include_unknown_member:
        unknown = spark.createDataFrame(
            [(-1, None, -1, -1, -1, -1, -1, 0, -1, -1)], out.schema
        )
        out = unknown.unionByName(out)
    return out
