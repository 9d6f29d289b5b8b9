"""Workloads for the semantic layer, streaming, multimodal plumbing,
simulation source, and SCD2 pattern — driver-visible proof of the
non-relational capability surface."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.io import read_table

DEC = "DECIMAL(18,6)"


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def semantic_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic layer (§2.12): 'revenue, n_orders, aov BY segment' over
    an orders x customer view; aov is a derived metric with NULLIF."""
    _prep(spark)
    from odibi_spark.semantics import Dimension, Metric, SemanticModel, SemanticQuery

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).createOrReplaceTempView("order_facts")

    model = SemanticModel(source="order_facts")
    model.add_metric(
        Metric(name="revenue", expr=f"CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE)")
    )
    model.add_metric(Metric(name="n_orders", expr="COUNT(*)"))
    model.add_metric(Metric(name="aov", formula="revenue / n_orders"))
    model.add_dimension(Dimension(name="segment", column="c_mktsegment"))
    return SemanticQuery(model).execute(spark, "revenue, n_orders, aov BY segment")


SEMANTIC_SQL = f"""
SELECT c_mktsegment AS segment,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) / COUNT(*) AS aov
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY 1
"""


def streaming_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming (§2.14): hourly tumbling-window aggregation
    driven to completion with availableNow + complete mode, so the
    result equals the equivalent batch GROUP BY."""
    _prep(spark)
    from odibi_spark.streaming import start_stream_write

    batch = read_table(spark, sf_dir, "events")
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in batch.schema.fields)
    tmp = tempfile.mkdtemp()
    src = f"{tmp}/src"
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ddl).parquet(src)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(f"CAST(value AS {DEC})")).alias("sum_d"),
        )
    )
    name = f"hourly_{abs(hash(tmp)) % 100000}"
    q = start_stream_write(
        agg, format="memory", output_mode="complete", query_name=name,
        checkpoint=f"{tmp}/ckpt", trigger={"availableNow": True},
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("hour_start"),
        "event_type",
        "n_events",
        F.col("sum_d").cast("double").alias("sum_value"),
    )


STREAMING_SQL = f"""
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload -> Arrow-batched mapInPandas
    feature extraction (deterministic stub decoder)."""
    _prep(spark)
    from odibi_spark.llm.multimodal import extract_image_features

    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return extract_image_features(docs, "payload", "media_id")


MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       CAST(64 + CAST(concat('0x', substring(sha256(text), 1, 2)) AS INTEGER) % 192 AS INTEGER) AS width,
       CAST(64 + CAST(concat('0x', substring(sha256(text), 3, 2)) AS INTEGER) % 192 AS INTEGER) AS height,
       3 AS channels,
       substring(sha256(text), 1, 16) AS content_hash
FROM documents
"""


# ---- rows-only (seeded RNG / multi-step state not SQL-expressible) ----

def simulated_sensor_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulation source (§2.13): seeded synthetic sensors -> rollup."""
    _prep(spark)
    from odibi_spark.sources.simulation import generate

    df = generate(
        spark,
        rows=10000,
        columns={
            "sensor": {"type": "categorical", "values": [f"s{i}" for i in range(20)]},
            "temp": {"type": "range", "min": 15.0, "max": 35.0},
            "ok": {"type": "boolean", "p_true": 0.95},
            "temp_f": {"type": "derived", "expr": "temp * 9 / 5 + 32"},
        },
        seed=42,
    )
    return df.groupBy("sensor").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("temp_f"), 4).alias("avg_temp_f"),
        F.sum(F.col("ok").cast("int")).alias("n_ok"),
    )


def scd2_customer_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 pattern (§2.9): two deterministic batches over customer;
    returns version counts per flag so the row set is stable."""
    _prep(spark)
    from odibi_spark.patterns.scd2 import scd2_apply

    tmp = tempfile.mkdtemp()
    path = f"{tmp}/dim"
    cust = read_table(spark, sf_dir, "customer").withColumn(
        "updated_at", F.to_timestamp(F.lit("2024-01-01"))
    )
    scd2_apply(
        spark, cust, target_path=path, keys=["c_custkey"],
        track_cols=["c_mktsegment"], effective_time_col="updated_at",
    )
    t1 = cust.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("CHANGED")).otherwise(
            F.col("c_mktsegment")
        ),
    ).withColumn("updated_at", F.to_timestamp(F.lit("2024-02-01")))
    dim = scd2_apply(
        spark, t1, target_path=path, keys=["c_custkey"],
        track_cols=["c_mktsegment"], effective_time_col="updated_at",
    )
    return dim.groupBy("is_current", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_versions")
    )


QUERIES = {
    "semantic_revenue_by_segment": semantic_revenue_by_segment,
    "streaming_hourly_events": streaming_hourly_events,
    "multimodal_image_features": multimodal_image_features,
    "simulated_sensor_rollup": simulated_sensor_rollup,
    "scd2_customer_batches": scd2_customer_batches,
}

ORACLES = {
    "semantic_revenue_by_segment": SEMANTIC_SQL,
    "streaming_hourly_events": STREAMING_SQL,
    "multimodal_image_features": MULTIMODAL_SQL,
    # simulated_sensor_rollup / scd2_customer_batches: rows-only
}
