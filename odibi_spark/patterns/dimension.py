"""Dimension pattern (reference: odibi/patterns/dimension.py:23-682):
SCD0/1/2 dimension build with surrogate-key assignment and unknown
member seeding.

- surrogate keys (reference :252-295): existing members keep their SK;
  new members get ``max(existing SK) + row_number()`` — a window over
  ONLY the new members, so the big existing dimension is read for one
  max() aggregate and one join.
- unknown member (reference :578+): SK -1 row seeded on first build so
  fact FK lookups never produce nulls.
- scd: "0" (insert-only), "1" (overwrite attributes in place),
  "2" (delegates to scd2_apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from odibi_spark.patterns.merge_target import ParquetTarget
from odibi_spark.patterns.scd2 import scd2_apply


def build_dimension(
    spark: SparkSession,
    batch: DataFrame,
    *,
    target_path: str,
    natural_keys: list[str],
    surrogate_key: str = "sk",
    scd: str = "1",
    track_cols: list[str] | None = None,
    effective_time_col: str | None = None,
    seed_unknown_member: bool = True,
) -> DataFrame:
    if scd == "2":
        assert track_cols and effective_time_col, "SCD2 needs track_cols + effective_time_col"
        out = scd2_apply(
            spark, _with_new_sks(spark, batch, target_path, natural_keys, surrogate_key),
            target_path=target_path, keys=natural_keys, track_cols=track_cols,
            effective_time_col=effective_time_col,
        )
        return out

    target = ParquetTarget(spark, target_path)
    if not target.exists():
        w = Window.orderBy(*natural_keys)
        dim = batch.dropDuplicates(natural_keys).withColumn(
            surrogate_key, F.row_number().over(w).cast("long")
        )
        if seed_unknown_member:
            unknown = _unknown_member(spark, dim, natural_keys, surrogate_key)
            dim = unknown.unionByName(dim)
        target.write_initial(dim)
        return target.read()

    existing = target.read()
    incoming = batch.dropDuplicates(natural_keys)
    new_members = incoming.join(existing.select(*natural_keys), natural_keys, "left_anti")
    max_sk = existing.agg(F.max(surrogate_key)).collect()[0][0] or 0
    w = Window.orderBy(*natural_keys)
    new_with_sk = new_members.withColumn(
        surrogate_key, (F.row_number().over(w) + F.lit(max_sk)).cast("long")
    )

    if scd == "0":
        out = existing.unionByName(new_with_sk, allowMissingColumns=True)
    elif scd == "1":
        # overwrite attributes of existing members, keep their SK
        sk_map = existing.select(*natural_keys, surrogate_key)
        updated = incoming.join(sk_map, natural_keys, "inner")
        untouched = existing.join(incoming.select(*natural_keys), natural_keys, "left_anti")
        out = untouched.unionByName(updated, allowMissingColumns=True).unionByName(
            new_with_sk, allowMissingColumns=True
        )
    else:
        raise ValueError(f"unknown scd type '{scd}'")
    target.overwrite(out)
    return target.read()


def _unknown_member(
    spark: SparkSession, dim: DataFrame, natural_keys: list[str], surrogate_key: str
) -> DataFrame:
    row = {}
    for f in dim.schema.fields:
        if f.name == surrogate_key:
            row[f.name] = -1
        elif f.dataType.simpleString() == "string":
            row[f.name] = "UNKNOWN"
        else:
            row[f.name] = None
    return spark.createDataFrame([row], dim.schema)


def _with_new_sks(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    natural_keys: list[str],
    surrogate_key: str,
) -> DataFrame:
    """Assign SKs for the SCD2 path: reuse current SK for known keys,
    allocate max+row_number for new keys."""
    target = ParquetTarget(spark, target_path)
    if not target.exists():
        w = Window.orderBy(*natural_keys)
        return batch.withColumn(surrogate_key, F.row_number().over(w).cast("long"))
    existing = target.read()
    sk_map = (
        existing.groupBy(*natural_keys).agg(F.max(surrogate_key).alias(surrogate_key))
    )
    known = batch.join(sk_map, natural_keys, "inner")
    new = batch.join(sk_map.select(*natural_keys), natural_keys, "left_anti")
    max_sk = existing.agg(F.max(surrogate_key)).collect()[0][0] or 0
    w = Window.orderBy(*natural_keys)
    new_sk = new.withColumn(
        surrogate_key, (F.row_number().over(w) + F.lit(max_sk)).cast("long")
    )
    return known.unionByName(new_sk)
