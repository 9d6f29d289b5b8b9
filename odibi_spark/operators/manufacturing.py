"""Manufacturing batch-phase detection (reference: odibi/transformers/
manufacturing.py:32-1337 ``detect_sequential_phases``).

Semantics: per entity (e.g. machine/batch), rows ordered by timestamp
carry a status/phase label; consecutive runs of the same status form a
PHASE. Output: one row per phase with start/end/duration and phase
index; optionally validate the observed status order against an
expected sequence.

The reference ships two Spark paths — applyInPandas per group
(:589-597) and a window-native variant (:599-788). Only the
window-native form is implemented here: change-flag = status !=
lag(status), cumulative sum -> phase index, then one groupBy. Two
window functions over one shuffle, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform


def detect_phases_frame(
    df: DataFrame,
    *,
    group_by: list[str],
    timestamp_col: str,
    status_col: str,
    expected_sequence: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    order = [F.col(timestamp_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(*group_by).orderBy(*order)
    changed = (
        ~F.col(status_col).eqNullSafe(F.lag(status_col).over(w))
    ).cast("int")
    run = F.sum("__chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    phased = (
        df.withColumn("__chg", changed)
        .withColumn("phase_index", run)
        .drop("__chg")
    )
    out = phased.groupBy(*group_by, "phase_index", status_col).agg(
        F.min(timestamp_col).alias("phase_start"),
        F.max(timestamp_col).alias("phase_end"),
        F.count(F.lit(1)).alias("n_rows"),
        (
            (F.unix_timestamp(F.max(timestamp_col)) - F.unix_timestamp(F.min(timestamp_col)))
            / 60.0
        ).alias("duration_minutes"),
    )
    if expected_sequence:
        seq = F.array(*[F.lit(s) for s in expected_sequence])
        expected_at = F.element_at(
            seq, ((F.col("phase_index") - 1) % F.lit(len(expected_sequence)) + 1).cast("int")
        )
        out = out.withColumn(
            "in_sequence", F.col(status_col).eqNullSafe(expected_at)
        )
    return out


@transform("detect_sequential_phases")
def detect_sequential_phases(
    ctx: EngineContext,
    *,
    group_by: list[str],
    timestamp_col: str,
    status_col: str,
    expected_sequence: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> EngineContext:
    return ctx.with_df(
        detect_phases_frame(
            ctx.df, group_by=group_by, timestamp_col=timestamp_col,
            status_col=status_col, expected_sequence=expected_sequence,
            tiebreak_cols=tiebreak_cols,
        )
    )
