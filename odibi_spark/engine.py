"""Engine utility surface — the remaining methods of the reference's
abstract engine contract (odibi/engine/base.py:9-334) not covered by
io/operators: schema introspection, schema policy harmonization,
null profiling, anonymization, content-hash change detection,
cross-node checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def get_schema(df: DataFrame) -> dict[str, str]:
    """{name -> simpleString} (reference: spark_engine.py:485-487)."""
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def count_nulls(df: DataFrame, columns: list[str] | None = None) -> dict[str, int]:
    """Null counts per column in ONE aggregate pass (reference
    engine contract ``count_nulls``)."""
    cols = columns or df.columns
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).collect()[0]
    return {c: int(row[c] or 0) for c in cols}


class SchemaPolicyError(Exception):
    pass


def harmonize_schema(
    df: DataFrame,
    target_schema: dict[str, str],
    *,
    on_new_columns: str = "add_nullable",   # add_nullable | fail | drop
    on_missing_columns: str = "project_null",  # project_null | fail
) -> DataFrame:
    """Schema-policy harmonization (reference: odibi/config.py:4355-4480
    EVOLVE/ENFORCE; Spark impl spark_engine.py:393-448).

    Aligns ``df`` to ``target_schema`` (name -> type):
    - columns in df not in target: kept (add_nullable), dropped, or error
    - columns in target not in df: projected as NULL of the right type,
      or error
    - common columns: cast to the target type
    The output puts target columns first in target order — a stable
    contract for downstream unions/writes.
    """
    df_cols = {f.name for f in df.schema.fields}
    extra = [c for c in df.columns if c not in target_schema]
    missing = [c for c in target_schema if c not in df_cols]

    if extra and on_new_columns == "fail":
        raise SchemaPolicyError(f"unexpected new columns: {extra}")
    if missing and on_missing_columns == "fail":
        raise SchemaPolicyError(f"missing required columns: {missing}")

    select = []
    for name, typ in target_schema.items():
        if name in df_cols:
            select.append(F.col(name).cast(typ).alias(name))
        else:
            select.append(F.lit(None).cast(typ).alias(name))
    if on_new_columns == "add_nullable":
        select.extend(F.col(c) for c in extra)
    return df.select(*select)


def anonymize(
    df: DataFrame,
    pii_columns: list[str],
    *,
    method: str = "sha256",
    salt: str = "",
) -> DataFrame:
    """PII protection per data-dictionary flags (reference:
    odibi/config.py:4345-4352 pii flags; engine ``anonymize``).
    Methods: sha256 (keyed-hash pseudonymization), mask, drop."""
    out = df
    for c in pii_columns:
        if method == "sha256":
            out = out.withColumn(
                c, F.sha2(F.concat_ws("|", F.lit(salt), F.col(c).cast("string")), 256)
            )
        elif method == "mask":
            out = out.withColumn(c, F.lit("***"))
        elif method == "drop":
            out = out.drop(c)
        else:
            raise ValueError(f"unknown anonymize method '{method}'")
    return out


def content_hash(df: DataFrame, columns: list[str] | None = None) -> str:
    """Order-insensitive content hash of a DataFrame (reference
    skip_if_unchanged: odibi/utils/content_hash.py, node.py:2831-2968).

    xor-aggregate of per-row sha2-derived 64-bit values — one scan, no
    sort, no collect of data. Used to skip writes whose contents are
    identical to the last run.
    """
    cols = columns or sorted(df.columns)
    row_hash = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols]
    )
    r = (
        df.select(row_hash.alias("h"))
        .agg(F.expr("bit_xor(h)").alias("x"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    return f"{r.n}:{r.x}"


def skip_if_unchanged(
    df: DataFrame, *, state, state_key: str, columns: list[str] | None = None
) -> tuple[bool, str]:
    """(skip, new_hash): ``skip`` is True when contents match the stored
    hash. Does NOT persist — commit via ``state.set(state_key, new_hash)``
    only AFTER the downstream write succeeds (pending-then-commit,
    reference odibi/node.py:2614,2929: persisting before the write means
    a failed write is skipped forever on retry/resume)."""
    h = content_hash(df, columns)
    return state.get(state_key) == h, h


def cross_check_row_counts(
    a: DataFrame, b: DataFrame, *, max_rel_diff: float = 0.0
) -> tuple[int, int]:
    """Cross-node row-count check (reference: odibi/transformers/
    validation.py:14-171 ``cross_check``); raises on divergence."""
    na, nb = a.count(), b.count()
    base = max(na, nb) or 1
    if abs(na - nb) / base > max_rel_diff:
        raise ValueError(
            f"row_count_diff {na} vs {nb} exceeds rel threshold {max_rel_diff}"
        )
    return na, nb


def cross_check_schema_match(a: DataFrame, b: DataFrame) -> None:
    sa, sb = get_schema(a), get_schema(b)
    if sa != sb:
        only_a = {k: v for k, v in sa.items() if sb.get(k) != v}
        only_b = {k: v for k, v in sb.items() if sa.get(k) != v}
        raise ValueError(f"schema mismatch: a={only_a} b={only_b}")
