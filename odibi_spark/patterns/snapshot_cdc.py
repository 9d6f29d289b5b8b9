"""Snapshot CDC — derive a change feed from two full extracts.

Upstreams without CDC hand over full snapshots; the warehouse needs
inserts/updates/deletes. Completes the family around delete_detection
(which only finds deletes — reference odibi/transformers/
delete_detection.py) and merge (which applies changes): this pattern
PRODUCES the change set that merge consumes.

Plan shape (100 TB): one full-outer co-partitioned join on the keys;
each side carries a map-side typed row hash (xxhash64 over a struct of
the compared columns — NULL-vs-'' and separator-safe, unlike string
concatenation), so "changed?" is one long compare and unchanged rows —
the overwhelming majority in a daily snapshot — are filtered before
anything else touches them. No windows, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _row_hash(df: DataFrame, cols: list[str]):
    # typed hash over a struct, NOT a pipe-joined string: concat_ws
    # cannot distinguish NULL from '' and is ambiguous when values
    # contain the separator — either would classify a real update as
    # 'unchanged' and silently drop it from the change feed
    return F.xxhash64(F.struct(*[F.col(c) for c in cols]))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    keys: list[str],
    compare_cols: list[str] | None = None,
    change_col: str = "_change_type",
    include_unchanged: bool = False,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots: ``insert`` (new only),
    ``delete`` (old only), ``update`` (both, row hash differs),
    ``unchanged`` (both, identical — dropped unless
    ``include_unchanged``). Inserts and updates carry the NEW row's
    values; deletes carry the OLD row's.

    ``compare_cols`` defaults to every shared non-key column.
    ``carry_cols`` (r15) ride along with the same carrying-row rule
    WITHOUT participating in the change hash — e.g. a partition
    column a per-partition rollup groups by while only the value
    columns define "changed". Keys are assumed unique per snapshot
    (snapshot grain); enforce upstream with deduplicate/validation if
    the extract can double-emit.
    """
    shared = [c for c in new.columns if c in old.columns and c not in keys]
    cmp_cols = compare_cols if compare_cols is not None else shared
    carry = [c for c in (carry_cols or []) if c not in cmp_cols]
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__old_{c}") for c in cmp_cols + carry],
        _row_hash(old, cmp_cols).alias("__old_h"),
    )
    n = new.select(
        *keys, *cmp_cols, *carry,
        _row_hash(new, cmp_cols).alias("__new_h"),
    )
    j = n.join(o, keys, "full_outer")
    change = (
        F.when(F.col("__old_h").isNull(), F.lit("insert"))
        .when(F.col("__new_h").isNull(), F.lit("delete"))
        .when(F.col("__new_h") != F.col("__old_h"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn(change_col, change)
    if not include_unchanged:
        out = out.filter(F.col(change_col) != "unchanged")
    # deletes carry the old values (the new side is null there)
    vals = [
        F.when(
            F.col(change_col) == "delete", F.col(f"__old_{c}")
        ).otherwise(F.col(c)).alias(c)
        for c in cmp_cols + carry
    ]
    return out.select(*keys, *vals, change_col)


def snapshot_cdc_apply(
    spark,
    new: DataFrame,
    *,
    target_path: str,
    keys: list[str],
    compare_cols: list[str] | None = None,
    change_col: str = "_change_type",
) -> DataFrame:
    """Pattern-phase form: diff the incoming snapshot against the
    stored target (parquet; Delta on a real cluster) and return the
    change feed — feed it to the merge pattern or a downstream sink."""
    from odibi_spark.patterns.merge_target import ParquetTarget

    target = ParquetTarget(spark, target_path)
    if not target.exists():
        return new.withColumn(change_col, F.lit("insert"))
    return snapshot_diff(
        target.read(), new, keys=keys, compare_cols=compare_cols,
        change_col=change_col,
    )
