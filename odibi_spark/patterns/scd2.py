"""SCD Type-2 dimension maintenance.

Semantics reproduced from the reference transformer (odibi/transformers/
scd.py:15-123 params, :310-551 Spark path, :553-735 Delta MERGE path):

- match on ``keys``; compare ``track_cols`` between incoming batch and
  the CURRENT version of each key;
- changed key: close the old version (``valid_to`` = incoming
  ``effective_time_col``, ``is_current`` = false) and insert the new
  version (``valid_from`` = effective time, ``valid_to`` = null,
  ``is_current`` = true);
- new key: insert as current;
- unchanged key: untouched;
- optional soft delete: keys present in the target but absent from the
  batch get their current version closed with ``is_deleted`` = true.

Scale design: one join of batch vs current-slice on the keys (the
historical slice is never scanned for comparison), then a union write.
On Delta this becomes the dual-match MERGE idiom (update-close +
insert via union'd source) exactly as the reference does; here the
ParquetTarget seam rewrites the table.

First-run bootstrap (reference :436-470): the whole batch becomes
version 1. Multi-batch replay is covered in tests/test_patterns.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.patterns.merge_target import ParquetTarget


def scd2_apply(
    spark: SparkSession,
    batch: DataFrame,
    *,
    target_path: str,
    keys: list[str],
    track_cols: list[str],
    effective_time_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    is_current_col: str = "is_current",
    soft_delete: bool = False,
    is_deleted_col: str = "is_deleted",
) -> DataFrame:
    """Apply one batch; returns the new full dimension contents."""
    target = ParquetTarget(spark, target_path)
    eff = F.col(effective_time_col)

    def as_version(df: DataFrame) -> DataFrame:
        out = (
            df.withColumn(valid_from_col, eff)
            .withColumn(valid_to_col, F.lit(None).cast("timestamp"))
            .withColumn(is_current_col, F.lit(True))
        )
        if soft_delete:
            out = out.withColumn(is_deleted_col, F.lit(False))
        return out

    if not target.exists():
        target.write_initial(as_version(batch))
        return target.read()

    existing = target.read()
    current = existing.filter(F.col(is_current_col))
    history = existing.filter(~F.col(is_current_col))

    # one equi-join current-slice vs batch on the keys; explicit join
    # condition so both sides keep their own key columns (c.k / b.k)
    b = batch.alias("b")
    c = current.alias("c")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"c.{k}").eqNullSafe(F.col(f"b.{k}"))
    joined = c.join(b, cond, "full_outer")

    changed_cond = F.lit(False)
    for t in track_cols:
        changed_cond = changed_cond | ~F.col(f"c.{t}").eqNullSafe(F.col(f"b.{t}"))

    in_batch = F.col(f"b.{keys[0]}").isNotNull()
    in_current = F.col(f"c.{keys[0]}").isNotNull()

    batch_cols = batch.columns

    # 1. keys whose current version must be closed
    closed = (
        joined.filter(in_batch & in_current & changed_cond)
        .select("c.*", F.col(f"b.{effective_time_col}").alias("__new_eff"))
        .withColumn(valid_to_col, F.col("__new_eff"))
        .withColumn(is_current_col, F.lit(False))
        .drop("__new_eff")
    )
    closed_keys = closed.select(*keys)

    # 2. new versions to insert (changed or brand-new keys)
    inserts = as_version(
        joined.filter(in_batch & (~in_current | changed_cond)).select(
            *[F.col(f"b.{col}").alias(col) for col in batch_cols]
        )
    )

    # 3. untouched current rows
    untouched = current.join(closed_keys, on=keys, how="left_anti")

    if soft_delete:
        # keys gone from the batch: close current version, flag deleted
        vanished = (
            joined.filter(in_current & ~in_batch)
            .select("c.*")
            .withColumn(is_current_col, F.lit(False))
            .withColumn(is_deleted_col, F.lit(True))
        )
        vanished_keys = vanished.select(*keys)
        untouched = untouched.join(vanished_keys, on=keys, how="left_anti")
        new_contents = history.unionByName(untouched).unionByName(closed).unionByName(
            vanished
        ).unionByName(inserts, allowMissingColumns=True)
    else:
        new_contents = (
            history.unionByName(untouched)
            .unionByName(closed)
            .unionByName(inserts, allowMissingColumns=True)
        )

    target.overwrite(new_contents)
    return target.read()


def scd2_delta_merge(
    spark: SparkSession,
    batch: DataFrame,
    *,
    target_path: str,
    keys: list[str],
    track_cols: list[str],
    effective_time_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    is_current_col: str = "is_current",
    delta_table_cls=None,
):
    """Delta MERGE fast path (reference odibi/transformers/scd.py:
    553-735): instead of rewriting the whole dimension, MERGE touches
    only files holding matched current rows.

    Phase 1 — one MERGE against the current slice:
      match  = keys AND target.is_current = true
      update (when any track_col changed, null-safe):
               close old version (valid_to = source effective time,
               is_current = false)
      insert (key absent): brand-new key as current version
    Phase 2 — MERGE can't insert for MATCHED keys, so the new versions
    of changed keys are appended separately: keys with no current row
    after phase 1 (left_anti vs current slice).

    Returns the merge-source frame on success, or ``None`` when Delta
    isn't available / the target isn't a Delta table — callers fall
    back to the ``scd2_apply`` full-rewrite path. ``delta_table_cls``
    is injectable so the MERGE call shape is contract-testable without
    Delta jars (it must quack like ``delta.tables.DeltaTable``).
    """
    cls = delta_table_cls
    if cls is None:
        try:
            from delta.tables import DeltaTable as cls  # type: ignore
        except ImportError:
            return None
    try:
        is_delta = cls.isDeltaTable(spark, target_path)
    except Exception:
        return None

    eff = F.col(effective_time_col)
    merge_source = (
        batch.withColumn(valid_from_col, eff)
        .withColumn(valid_to_col, F.lit(None).cast("timestamp"))
        .withColumn(is_current_col, F.lit(True))
    )

    if not is_delta:  # first run: the whole batch becomes version 1
        merge_source.write.format("delta").mode("overwrite").save(target_path)
        return merge_source

    target = cls.forPath(spark, target_path)
    match_condition = (
        " AND ".join(f"target.`{k}` = source.`{k}`" for k in keys)
        + f" AND target.`{is_current_col}` = true"
    )
    change_condition = (
        " OR ".join(
            f"NOT (target.`{c}` <=> source.`{c}`)" for c in track_cols
        )
        or "true"
    )
    update_set = {
        f"`{valid_to_col}`": f"source.`{effective_time_col}`",
        f"`{is_current_col}`": "false",
    }
    insert_values = {f"`{c}`": f"source.`{c}`" for c in merge_source.columns}
    (
        target.alias("target")
        .merge(merge_source.alias("source"), match_condition)
        .whenMatchedUpdate(condition=change_condition, set=update_set)
        .whenNotMatchedInsert(values=insert_values)
        .execute()
    )

    # phase 2: append the new versions of keys whose current row was
    # just closed (they matched, so whenNotMatchedInsert skipped them)
    updated = cls.forPath(spark, target_path).toDF()
    current_keys = updated.filter(F.col(is_current_col)).select(*keys)
    changed_new = merge_source.join(current_keys, on=keys, how="left_anti")
    changed_new.write.format("delta").mode("append").save(target_path)
    return merge_source
