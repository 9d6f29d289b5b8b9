"""Delta Lake maintenance operations — OPTIMIZE / ZORDER, liquid
clustering, VACUUM, history, restore, time travel, table registration.

Parity target (reference: odibi/engine/spark_engine.py —
_optimize_delta_write :297-325, time-travel read options :518-545,
register_table :1497-1503, cluster_by CREATE :1530-1559, vacuum_delta
:2446-2495, get_delta_history :2498-2560, maintain (OPTIMIZE+VACUUM)
:2607-2636, restore :2563-2604).

This environment has no Delta jars, so every function takes an
injectable seam (``sql_runner`` for SQL-driven ops, ``delta_table_cls``
for DeltaTable-API ops) and the call shapes are locked by mocked
contract tests (tests/test_delta_contracts.py) — drop-in when
delta-spark is present. Functions return the SQL they issued (or the
DeltaTable result) so callers and tests can audit exactly what ran.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _delta_cls(delta_table_cls):
    if delta_table_cls is not None:
        return delta_table_cls
    try:
        from delta.tables import DeltaTable  # type: ignore

        return DeltaTable
    except ImportError as ex:
        raise ImportError(
            "Delta Lake support requires delta-spark on the classpath"
        ) from ex


def _target_ref(path_or_table: str, is_table: bool) -> str:
    return path_or_table if is_table else f"delta.`{path_or_table}`"


def optimize(
    spark: SparkSession,
    path_or_table: str,
    *,
    zorder_by: list[str] | None = None,
    is_table: bool = False,
    sql_runner=None,
) -> str:
    """OPTIMIZE [ZORDER BY (...)] (reference spark_engine.py:297-325).
    Returns the SQL issued."""
    sql = f"OPTIMIZE {_target_ref(path_or_table, is_table)}"
    if zorder_by:
        sql += f" ZORDER BY ({', '.join(zorder_by)})"
    (sql_runner or spark.sql)(sql)
    return sql


def vacuum(
    spark: SparkSession,
    path: str,
    *,
    retention_hours: float = 168,
    delta_table_cls=None,
):
    """Remove files older than the retention window (reference
    vacuum_delta spark_engine.py:2446-2495; DeltaTable.vacuum takes
    retention in HOURS... the reference passes hours/24 — that is a
    reference bug we do NOT reproduce: delta-spark's vacuum() argument
    is documented as hours)."""
    target = _delta_cls(delta_table_cls).forPath(spark, path)
    return target.vacuum(retention_hours)


def history(
    spark: SparkSession, path: str, *, limit: int | None = None, delta_table_cls=None
):
    """Commit history DataFrame (reference spark_engine.py:2498-2560)."""
    target = _delta_cls(delta_table_cls).forPath(spark, path)
    return target.history(limit) if limit else target.history()


def restore_to_version(
    spark: SparkSession, path: str, version: int, *, delta_table_cls=None
):
    """Roll the table back to a version (reference :2563-2604)."""
    target = _delta_cls(delta_table_cls).forPath(spark, path)
    return target.restoreToVersion(version)


def time_travel_options(
    *, as_of_version: int | None = None, as_of_timestamp: str | None = None
) -> dict[str, str]:
    """Reader options for Delta time travel (reference read options
    :518-545): pass to ``read_source(..., options=...)`` with
    format='delta'."""
    if as_of_version is not None and as_of_timestamp is not None:
        raise ValueError("give as_of_version OR as_of_timestamp, not both")
    if as_of_version is not None:
        return {"versionAsOf": str(as_of_version)}
    if as_of_timestamp is not None:
        return {"timestampAsOf": as_of_timestamp}
    return {}


def register_table(
    spark: SparkSession, table: str, path: str, *, sql_runner=None
) -> str:
    """Register an external Delta location in the metastore (reference
    :1497-1503). Returns the SQL issued."""
    sql = f"CREATE TABLE IF NOT EXISTS {table} USING DELTA LOCATION '{path}'"
    (sql_runner or spark.sql)(sql)
    return sql


def create_clustered_table_sql(
    table_or_path: str,
    cluster_by: list[str] | str,
    *,
    schema_ddl: str = "",
    is_table: bool = True,
) -> str:
    """CREATE-with-liquid-clustering DDL text (reference cluster_by
    :1530-1577). Liquid clustering supersedes partitioning; the
    reference warns when both are set — callers enforce that."""
    if isinstance(cluster_by, str):
        cluster_by = [cluster_by]
    target = table_or_path if is_table else f"delta.`{table_or_path}`"
    cols = ", ".join(cluster_by)
    schema = f" ({schema_ddl})" if schema_ddl else ""
    return (
        f"CREATE TABLE IF NOT EXISTS {target}{schema} USING DELTA "
        f"CLUSTER BY ({cols})"
    )


def maintain(
    spark: SparkSession,
    path_or_table: str,
    *,
    zorder_by: list[str] | None = None,
    vacuum_retention_hours: float | None = None,
    is_table: bool = False,
    sql_runner=None,
) -> list[str]:
    """OPTIMIZE then VACUUM RETAIN (reference maintain :2607-2636).
    Returns the SQL statements issued, in order."""
    run = sql_runner or spark.sql
    issued = [
        optimize(
            spark, path_or_table,
            zorder_by=zorder_by, is_table=is_table, sql_runner=run,
        )
    ]
    if vacuum_retention_hours is not None:
        sql = (
            f"VACUUM {_target_ref(path_or_table, is_table)} "
            f"RETAIN {vacuum_retention_hours} HOURS"
        )
        run(sql)
        issued.append(sql)
    return issued
