"""Shared ingest helper for the declared workloads.

``read_table`` here is the workload-layer twin of
``odibi_spark.io.read_table`` plus small-input scale-out: the sf0.x
testdata tables are single-row-group parquet files, which Spark reads
as ONE input split — so without this every map-side expression in
every workload (shingle hashing, regex scrubbing, decimal partial
aggregation over lineitem) runs on one core of the 32 available. The
wrapper fans reads out to cluster parallelism via
:func:`odibi_spark.io.scale_out`, skipping tiny dimension tables
(region/nation/supplier/part) where a 32-task stage costs more than
the single-partition scan it replaces. At real scale the fan-out is a
structural no-op: inputs above one split-width already arrive
parallel, and ``scale_out`` returns them unchanged.

The fan-out is deliberately LIMITED to the tables whose workloads are
map-side-CPU-bound — documents (md5 shingling, regex scrubbing,
n-gram work) and embeddings (per-row dot products). For scan+agg
tables (lineitem/orders/events) a warm A/B at sf0.1 showed the
opposite: the extra round-robin exchange costs more than the extra
cores save once the page cache is warm (q1: 0.34 s un-fanned vs
0.64 s fanned), confirming the round-4 decision recorded in
SCALING.md not to inject repartitions in front of scan-bound plans.

Operators themselves never do this — their plan contracts (map-side
only, N-exchange bounds) stay pure; parallelizing a narrow ingest is a
job-edge decision, which is exactly what the workload layer is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from odibi_spark.io import read_table as _io_read_table, scale_out

#: Tables whose declared workloads are map-side-CPU-bound: fanning the
#: single testdata split out to all cores wins warm AND cold. Scan- or
#: shuffle-bound tables are deliberately absent (see module docstring).
SCALE_OUT_TABLES = {"documents", "embeddings"}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _io_read_table(spark, sf_dir, name)
    if name in SCALE_OUT_TABLES:
        return scale_out(df)
    return df
