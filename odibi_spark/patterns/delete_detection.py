"""Delete detection — CDC without CDC (reference: odibi/transformers/
delete_detection.py:39-531, config odibi/config.py:239-403):

compare the full set of source keys against the target; keys present
in the target but absent from the source have been deleted upstream.
``max_delete_percent`` is a circuit breaker: if the source suddenly
shrinks (upstream truncation, bad extract), abort instead of deleting
half the warehouse.

- soft delete: flag column set true (history preserved)
- hard delete: rows removed
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.patterns.merge_target import ParquetTarget


class DeleteCircuitBreaker(Exception):
    pass


def detect_deletes(
    spark: SparkSession,
    source_keys: DataFrame,
    *,
    target_path: str,
    keys: list[str],
    mode: str = "soft",
    is_deleted_col: str = "_is_deleted",
    max_delete_percent: float | None = 20.0,
) -> DataFrame:
    target = ParquetTarget(spark, target_path)
    if not target.exists():
        raise ValueError(f"delete detection target missing: {target_path}")
    existing = target.read()
    live = (
        existing.filter(~F.coalesce(F.col(is_deleted_col), F.lit(False)))
        if is_deleted_col in existing.columns
        else existing
    )

    vanished = live.select(*keys).distinct().join(
        source_keys.select(*keys).distinct(), keys, "left_anti"
    )
    # one pass for both counts
    n_live = live.select(*keys).distinct().count()
    n_vanished = vanished.count()
    if max_delete_percent is not None and n_live > 0:
        pct = 100.0 * n_vanished / n_live
        if pct > max_delete_percent:
            raise DeleteCircuitBreaker(
                f"{n_vanished}/{n_live} keys ({pct:.1f}%) would be deleted; "
                f"limit {max_delete_percent}%"
            )

    if mode == "hard":
        out = existing.join(vanished, keys, "left_anti")
    elif mode == "soft":
        if is_deleted_col not in existing.columns:
            existing = existing.withColumn(is_deleted_col, F.lit(False))
        flagged = existing.join(vanished, keys, "left_semi").withColumn(
            is_deleted_col, F.lit(True)
        )
        untouched = existing.join(vanished, keys, "left_anti")
        out = untouched.unionByName(flagged)
    else:
        raise ValueError(f"unknown delete mode '{mode}'")
    target.overwrite(out)
    return target.read()
