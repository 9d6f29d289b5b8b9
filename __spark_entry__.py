"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (revenue by nation over the
  lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region chain) at sf0.001.
- ``queries()``: every declared workload from SURVEY §2 + the LLM-data
  operator set (odibi_spark.workloads).
- ``oracle_sql()``: DuckDB-dialect equivalents for the SQL-expressible
  subset; minhash/simhash/LSH entries are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from odibi_spark.workloads import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q5_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
