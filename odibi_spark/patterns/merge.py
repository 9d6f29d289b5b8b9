"""Merge pattern (reference: odibi/transformers/merge_transformer.py:
18-640): strategies ``upsert`` / ``append_only`` / ``delete_match``
with optional row-level conditions and audit columns.

- upsert: matched rows updated (optionally only when
  ``update_condition`` holds), unmatched inserted (optionally gated by
  ``insert_condition``).
- append_only: insert-if-absent (idempotent replays).
- delete_match: delete target rows whose keys appear in the batch
  (GDPR erasure), optionally gated by ``delete_condition``.
- audit cols (reference :191-229): created_at on insert, updated_at on
  update.

Conditions reference columns as ``t.col`` (target) / ``s.col``
(source), same contract as the reference's Delta MERGE conditions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.patterns.merge_target import ParquetTarget


def merge_apply(
    spark: SparkSession,
    batch: DataFrame,
    *,
    target_path: str,
    keys: list[str],
    strategy: str = "upsert",
    update_condition: str | None = None,
    insert_condition: str | None = None,
    delete_condition: str | None = None,
    audit_cols: bool = False,
) -> DataFrame:
    target = ParquetTarget(spark, target_path)
    now = F.current_timestamp()

    def with_insert_audit(df: DataFrame) -> DataFrame:
        if audit_cols:
            return df.withColumn("created_at", now).withColumn("updated_at", now)
        return df

    if strategy == "delete_match":
        if not target.exists():
            return spark.createDataFrame([], batch.schema)
        t, s = target.read().alias("t"), batch.alias("s")
        cond = F.lit(True)
        for k in keys:
            cond = cond & F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        if delete_condition:
            cond = cond & F.expr(delete_condition)
        doomed_keys = t.join(s, cond, "inner").select(*[F.col(f"t.{k}") for k in keys]).distinct()
        kept = target.read().join(doomed_keys, on=keys, how="left_anti")
        target.overwrite(kept)
        return target.read()

    incoming = batch.dropDuplicates(keys)
    if not target.exists():
        if insert_condition:
            incoming = _filter_merge_cond(incoming, insert_condition, side="s")
        target.write_initial(with_insert_audit(incoming))
        return target.read()

    existing = target.read()
    t, s = existing.alias("t"), incoming.alias("s")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))

    matched_keys = t.join(s, cond, "inner").select(
        *[F.col(f"t.{k}").alias(k) for k in keys]
    ).distinct()
    new_rows = incoming.join(existing.select(*keys).distinct(), on=keys, how="left_anti")
    if insert_condition:
        new_rows = _filter_merge_cond(new_rows, insert_condition, side="s")
    new_rows = with_insert_audit(new_rows)

    if strategy == "append_only":
        out = existing.unionByName(new_rows, allowMissingColumns=True)
        target.overwrite(out)
        return target.read()

    if strategy != "upsert":
        raise ValueError(f"unknown merge strategy '{strategy}'")

    # upsert: replace matched target rows with source versions
    if update_condition:
        # only matched pairs satisfying the condition are updated
        upd_pairs = t.join(s, cond & F.expr(update_condition), "inner")
        upd_keys = upd_pairs.select(*[F.col(f"t.{k}").alias(k) for k in keys]).distinct()
    else:
        upd_keys = matched_keys
    updates = incoming.join(upd_keys, on=keys, how="left_semi")
    if audit_cols:
        created = existing.select(*keys, "created_at")
        updates = (
            updates.join(created, on=keys, how="left")
            .withColumn("updated_at", now)
            .withColumn("created_at", F.coalesce(F.col("created_at"), now))
        )
    kept = existing.join(upd_keys, on=keys, how="left_anti")
    out = kept.unionByName(updates, allowMissingColumns=True).unionByName(
        new_rows, allowMissingColumns=True
    )
    target.overwrite(out)
    return target.read()


def _filter_merge_cond(df: DataFrame, condition: str, side: str) -> DataFrame:
    """Apply a merge-style condition (``s.col``) to a bare frame."""
    return df.alias(side).filter(F.expr(condition))
