"""Incremental aggregation pattern (reference: odibi/patterns/
aggregation.py:49-570, merge fns :344-504): grain + measures with
HAVING, merged into an existing target by strategy:

- merge_replace: incoming grain rows replace target rows
- merge_sum / merge_min / merge_max: combine measure values
  (tgt.m + src.m / least / greatest) — the Delta form is
  ``WHEN MATCHED UPDATE SET tgt.m = tgt.m + src.m``.

This is what makes incremental rollups possible: each batch aggregates
only its own rows, the merge folds them into the running totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.patterns.merge_target import ParquetTarget

_COMBINE = {
    "merge_sum": lambda t, s: t + s,
    "merge_min": F.least,
    "merge_max": F.greatest,
}


def aggregate_incremental(
    spark: SparkSession,
    batch: DataFrame,
    *,
    target_path: str,
    grain: list[str],
    measures: dict[str, str],
    strategy: str = "merge_replace",
    having: str | None = None,
) -> DataFrame:
    """``measures``: {out_col: sql_agg_expr} e.g. {"revenue": "sum(amount)"}."""
    aggs = [F.expr(expr).alias(name) for name, expr in measures.items()]
    agged = batch.groupBy(*grain).agg(*aggs)
    if having:
        agged = agged.filter(having)

    target = ParquetTarget(spark, target_path)
    if not target.exists():
        target.write_initial(agged)
        return target.read()

    existing = target.read()
    if strategy == "merge_replace":
        kept = existing.join(agged.select(*grain), grain, "left_anti")
        out = kept.unionByName(agged, allowMissingColumns=True)
    elif strategy in _COMBINE:
        combine = _COMBINE[strategy]
        t = existing.alias("t")
        s = agged.alias("s")
        matched = t.join(s, grain, "inner").select(
            *grain,
            *[
                combine(F.col(f"t.{m}"), F.col(f"s.{m}")).alias(m)
                for m in measures
            ],
        )
        unmatched_t = existing.join(agged.select(*grain), grain, "left_anti")
        unmatched_s = agged.join(existing.select(*grain), grain, "left_anti")
        out = matched.unionByName(unmatched_t).unionByName(unmatched_s)
    else:
        raise ValueError(f"unknown aggregation merge strategy '{strategy}'")
    target.overwrite(out)
    return target.read()
