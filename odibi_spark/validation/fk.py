"""Foreign-key (orphan) validation (reference: odibi/validation/fk.py:
40-534, Spark :262-305): LEFT ANTI join fact -> dimension; behavior on
violation: warn / fail / quarantine."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from odibi_spark.operators.relational import apply_broadcast_hint


class FKViolation(Exception):
    pass


@dataclass
class FKResult:
    orphan_count: int
    valid_rows: DataFrame
    orphan_rows: DataFrame


def validate_foreign_key(
    fact: DataFrame,
    dimension: DataFrame,
    *,
    fact_keys: list[str],
    dim_keys: list[str] | None = None,
    on_violation: str = "warn",
) -> FKResult:
    dim_keys = dim_keys or fact_keys
    dim_sel = dimension.select(
        *[F.col(d).alias(f) for d, f in zip(dim_keys, fact_keys)]
    ).distinct()
    orphans = fact.join(apply_broadcast_hint(dim_sel), on=fact_keys, how="left_anti")
    n = orphans.count()
    if n and on_violation == "fail":
        raise FKViolation(f"{n} orphan rows violate FK on {fact_keys}")
    if n and on_violation == "quarantine":
        valid = fact.join(apply_broadcast_hint(dim_sel), on=fact_keys, how="left_semi")
        orphans = orphans.withColumn(
            "_quarantine_reason", F.lit(f"fk_orphan:{','.join(fact_keys)}")
        )
        return FKResult(n, valid, orphans)
    return FKResult(n, fact, orphans)
