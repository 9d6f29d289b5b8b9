"""Shared ingest helper for the declared workloads.

``read_table`` here is the workload-layer twin of
``odibi_spark.io.read_table`` plus small-input scale-out: the sf0.x
testdata tables are single-row-group parquet files, which Spark reads
as ONE input split — so without this every map-side expression in
every workload (shingle hashing, regex scrubbing, per-row dot
products) runs on one core of the 32 available. The wrapper fans
reads out to cluster parallelism via
:func:`odibi_spark.io.scale_out`. At real scale the fan-out is a
structural no-op: inputs above one split-width already arrive
parallel, and ``scale_out`` returns them unchanged.

Fan-out is gated on the CALLER declaring the downstream work
CPU-heavy (``cpu_heavy=True``), not on the table's name (VERDICT r5
task 4 — the old ``SCALE_OUT_TABLES`` name keying was bench tuning
that would not transfer to a user's tables, and it taxed cheap
one-groupBy queries with an exchange that pays off only when per-row
CPU dominates). Shingling, regex chains, and per-row vector math opt
in at their call sites; plain scans/groupBys don't: a warm A/B at
sf0.1 showed the extra round-robin exchange LOSES on scan-bound
plans (exact_dedup_docs 0.35 s un-fanned vs 0.78 s fanned in the r5
driver run), confirming the round-4 decision recorded in SCALING.md
not to inject repartitions in front of scan-bound plans. The
per-workload A/B is the arbiter, not the table: q1's decimal-exact
rewrite made its map stage arithmetic-bound, so it re-opted IN
(0.62 s fanned vs 0.97 s on 3 splits, r6 warm alternating A/B). The partition-count guard inside ``scale_out``
(current partitions >= defaultParallelism -> unchanged) supplies the
measured-input half of the decision.

Operators themselves never do this — their plan contracts (map-side
only, N-exchange bounds) stay pure; parallelizing a narrow ingest is a
job-edge decision, which is exactly what the workload layer is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from odibi_spark.io import read_table as _io_read_table, scale_out


def untuned_session_prep(spark: SparkSession) -> None:
    """Shared per-workload session prep (r16, VERDICT r15 #2): pin the
    UTC timezone and right-size shuffle partitions when running under
    an UNTUNED session (Spark's static default of 200). The partition
    count derives from the same env knob ``session.get_spark`` uses —
    never a literal core count, so the driver's lower-core scaling
    legs get a matching layout. AQE (default-on in Spark 4) coalesces
    further at runtime."""
    from odibi_spark.session import DEFAULT_SHUFFLE_PARTITIONS

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)
        )


def read_table(
    spark: SparkSession, sf_dir: str, name: str, *, cpu_heavy: bool = False
) -> DataFrame:
    df = _io_read_table(spark, sf_dir, name)
    if cpu_heavy:
        return scale_out(df)
    return df
