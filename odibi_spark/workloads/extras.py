"""Workloads for the semantic layer, streaming, multimodal plumbing,
simulation source, and SCD2 pattern — driver-visible proof of the
non-relational capability surface."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.workloads.common import read_table, untuned_session_prep

DEC = "DECIMAL(18,6)"


def _prep(spark: SparkSession) -> None:
    untuned_session_prep(spark)


def semantic_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic layer (§2.12): 'revenue, n_orders, aov BY segment' over
    an orders x customer view; aov is a derived metric with NULLIF."""
    _prep(spark)
    from odibi_spark.semantics import Dimension, Metric, SemanticModel, SemanticQuery

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    # customer is SF-linear: no forced broadcast, AQE picks the strategy
    orders.join(
        cust, orders.o_custkey == cust.c_custkey
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

    docs = read_table(spark, sf_dir, "documents", cpu_heavy=True).select(
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


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV round-trip under the hash oracle (VERDICT r6 task 9):
    synthesize a deterministic PCM16 WAV per document (n = 120 +
    doc_id % 320 samples of ((doc_id*31 + i*7) % 2048) - 1024 at
    16 kHz) inside mapInPandas, then decode it with the stdlib
    ``wave`` parser — the oracle regenerates the same samples with
    generate_series and recomputes duration/RMS from exact integer
    sums, so every feature the real decoder emits is hash-checked.
    Payloads are built AND decoded executor-side; nothing binary
    crosses the driver."""
    _prep(spark)
    from odibi_spark.llm.multimodal import extract_audio_features, synth_wav_pcm16

    docs = read_table(spark, sf_dir, "documents", cpu_heavy=True).select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it):
        for pdf in it:
            ids = pdf["media_id"].tolist()
            payloads = []
            for d in ids:
                n = 120 + d % 320
                payloads.append(synth_wav_pcm16(
                    [((d * 31 + i * 7) % 2048) - 1024 for i in range(n)]
                ))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    wavs = docs.mapInPandas(synth, "media_id long, payload binary")
    return extract_audio_features(wavs, "payload", "media_id").select(
        "media_id", "sample_rate", "duration_s", "n_samples", "rms"
    )


MULTIMODAL_AUDIO_SQL = """
WITH base AS (
  SELECT doc_id, 120 + doc_id % 320 AS n FROM documents
), idx AS (
  SELECT doc_id, n, UNNEST(generate_series(0, n - 1)) AS i FROM base
), samp AS (
  SELECT doc_id, n, ((doc_id * 31 + i * 7) % 2048) - 1024 AS v FROM idx
)
SELECT doc_id AS media_id,
       16000 AS sample_rate,
       CAST(n AS DOUBLE) / 16000 AS duration_s,
       CAST(n AS BIGINT) AS n_samples,
       sqrt(CAST(SUM(v * v) AS DOUBLE) / n) AS rms
FROM samp GROUP BY doc_id, n
"""


def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (beyond-reference operator): each click matched to the
    user's most recent purchase at-or-before it."""
    _prep(spark)
    from odibi_spark.operators.temporal_join import asof_join_frames

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = ev.filter("event_type = 'purchase'").select("user_id", "ts", "value")
    return asof_join_frames(clicks, purchases, on="ts", by=["user_id"])


ASOF_SQL = """
SELECT c.event_id, c.user_id, c.ts, p.value AS r_value, p.ts AS r_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
ON c.user_id = p.user_id AND p.ts <= c.ts
"""


def range_clicks_per_purchase_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (beyond-reference operator): clicks falling in the
    hour after each purchase, via bucketized band join."""
    _prep(spark)
    from odibi_spark.operators.temporal_join import range_join_frames

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts")
    purchases = (
        ev.filter("event_type = 'purchase'")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("lo"))
        .withColumn("hi", F.col("lo") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = range_join_frames(
        clicks, purchases, left_point="ts", right_start="lo", right_end="hi",
        keys=["user_id"], bucket_width=3600,
    )
    return joined.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_clicks"))


RANGE_SQL = """
SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
GROUP BY 1
"""


def simulated_sensor_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulation source (§2.13): seeded synthetic sensors -> rollup.
    Uses the distributed generator with the portable md5-fold hash so
    the DuckDB oracle regenerates the identical dataset."""
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
        distributed=True,
        portable_hash=True,
    )
    return df.groupBy("sensor").agg(
        F.count(F.lit(1)).alias("n"),
        # decimal-exact sum -> order-independent average across engines
        F.round(
            F.sum(F.expr(f"CAST(temp_f AS {DEC})")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_temp_f"),
        F.sum(F.col("ok").cast("int")).alias("n_ok"),
    )


def _sim_u(name: str) -> str:
    """DuckDB replica of the portable uniform in sources/simulation.py."""
    return (
        "(CAST(concat('0x', substring(md5(concat_ws('|', '42', "
        f"'{name}', CAST(i AS VARCHAR))), 1, 15)) AS BIGINT) "
        "% 1000000000000) / 1000000000000.0"
    )


_SENSOR_LIST = ", ".join(f"'s{i}'" for i in range(20))
SIMULATED_SQL = f"""
WITH u AS (
  SELECT {_sim_u('sensor')} AS u_sensor,
         {_sim_u('temp')} AS u_temp,
         {_sim_u('ok')} AS u_ok
  FROM range(10000) t(i)
),
rows_ AS (
  SELECT ([{_SENSOR_LIST}])[LEAST(CAST(floor(u_sensor * 20) AS INTEGER) + 1, 20)] AS sensor,
         (15.0 + u_temp * (35.0 - 15.0)) * 9 / 5 + 32 AS temp_f,
         u_ok < 0.95 AS ok
  FROM u
)
SELECT sensor, COUNT(*) AS n,
       round(CAST(SUM(CAST(temp_f AS {DEC})) AS DOUBLE) / COUNT(*), 4) AS avg_temp_f,
       CAST(SUM(CAST(ok AS INTEGER)) AS BIGINT) AS n_ok
FROM rows_ GROUP BY sensor
"""


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


# Expected-result oracle derived from SCD2 semantics: keys with
# c_custkey % 7 = 0 change segment in batch 2 -> one closed version
# (original segment) + one current ('CHANGED'); all others keep a
# single current version.
SCD2_SQL = """
WITH v AS (
  SELECT TRUE AS is_current,
         CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer
  UNION ALL
  SELECT FALSE, c_mktsegment FROM customer WHERE c_custkey % 7 = 0
)
SELECT is_current, c_mktsegment, COUNT(*) AS n_versions
FROM v GROUP BY 1, 2
"""


QUERIES = {
    "semantic_revenue_by_segment": semantic_revenue_by_segment,
    "streaming_hourly_events": streaming_hourly_events,
    "multimodal_image_features": multimodal_image_features,
    "multimodal_audio_features": multimodal_audio_features,
    "asof_click_purchase": asof_click_purchase,
    "range_clicks_per_purchase_hour": range_clicks_per_purchase_hour,
    "simulated_sensor_rollup": simulated_sensor_rollup,
    "scd2_customer_batches": scd2_customer_batches,
}

ORACLES = {
    "semantic_revenue_by_segment": SEMANTIC_SQL,
    "streaming_hourly_events": STREAMING_SQL,
    "multimodal_image_features": MULTIMODAL_SQL,
    "multimodal_audio_features": MULTIMODAL_AUDIO_SQL,
    "asof_click_purchase": ASOF_SQL,
    "range_clicks_per_purchase_hour": RANGE_SQL,
    "simulated_sensor_rollup": SIMULATED_SQL,
    "scd2_customer_batches": SCD2_SQL,
}


def detect_event_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect_sequential_phases (§2.6 manufacturing): runs of identical
    event_type per user form phases; window-native run-length encoding."""
    _prep(spark)
    from odibi_spark.operators.manufacturing import detect_phases_frame

    ev = read_table(spark, sf_dir, "events")
    out = detect_phases_frame(
        ev, group_by=["user_id"], timestamp_col="ts", status_col="event_type",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id", "phase_index", "event_type", "phase_start", "phase_end",
        "n_rows", F.round("duration_minutes", 6).alias("duration_minutes"),
    )


DETECT_PHASES_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_type,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS phase_index
  FROM flagged
)
SELECT user_id, phase_index, event_type,
       MIN(ts) AS phase_start, MAX(ts) AS phase_end,
       COUNT(*) AS n_rows,
       round((CAST(floor(epoch(MAX(ts))) AS BIGINT)
              - CAST(floor(epoch(MIN(ts))) AS BIGINT)) / 60.0, 6)
         AS duration_minutes
FROM runs GROUP BY user_id, phase_index, event_type
"""


def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window streaming sessionization (beyond reference §2.14).

    A far-future sentinel event (user_id = -1, year 2100) appended to
    the source advances the event-time watermark past every real
    session, so append mode finalizes and emits ALL real sessions —
    making the streaming result equal to the batch sessionization and
    therefore DuckDB-oracle-checkable. (Without the sentinel, sessions
    within the watermark lag of the stream's end stay pending forever.)
    """
    _prep(spark)
    from odibi_spark.streaming import start_stream_write, streaming_sessionize

    batch = read_table(spark, sf_dir, "events")
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in batch.schema.fields)
    tmp = tempfile.mkdtemp()
    batch.write.mode("overwrite").parquet(f"{tmp}/src")
    sentinel = spark.createDataFrame(
        [(int(-1), "2100-01-01 00:00:00", int(-1), "sentinel", 0.0, None)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sentinel.select(*batch.columns).write.mode("append").parquet(f"{tmp}/src")
    stream = spark.readStream.schema(ddl).parquet(f"{tmp}/src")
    sess = streaming_sessionize(
        stream, ts_col="ts", gap="30 minutes", watermark="1 hour",
        group_cols=["user_id"], aggs={"n_events": "count(*)"},
    )
    name = f"sess_{abs(hash(tmp)) % 100000}"
    q = start_stream_write(
        sess, format="memory", output_mode="append", query_name=name,
        checkpoint=f"{tmp}/ckpt", trigger={"availableNow": True},
    )
    q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0).select(
        "user_id",
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        "n_events",
    )


SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
runs AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM runs GROUP BY user_id, sid
"""


QUERIES.update(
    {
        "detect_event_phases": detect_event_phases,
        "streaming_user_sessions": streaming_user_sessions,
    }
)
ORACLES.update(
    {
        "detect_event_phases": DETECT_PHASES_SQL,
        "streaming_user_sessions": SESSIONS_SQL,
    }
)


# ------------------------------------------------------- skewed join
# Plan intent (100 TB): event_type is the canonical EXTREME-hot-key
# join — 5 distinct values over the whole fact table, so every key
# holds ~20% of all rows and even AQE's skew splitting leaves one
# straggler task per key. salted_join spreads each hot key across 8
# salt buckets (operators/skew.py): the dim side is replicated 8x
# (trivial — it is O(event types) rows), the fact side shuffles on
# (event_type, salt) into 8x more, uniformly loaded tasks.
def star_fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse patterns (§2.9) under oracle coverage: build_dimension
    (SCD1 customer dim — deterministic surrogate keys = row_number over
    the natural key, plus the seeded SK -1 unknown member) then
    build_fact (broadcast SK lookup, derived measure, grain
    validation). The oracle replicates the SK assignment and lookup in
    SQL. The fact keeps orders grain; lookups are broadcast left joins
    with COALESCE(sk, -1) for unknown members."""
    _prep(spark)
    from odibi_spark.patterns.dimension import build_dimension
    from odibi_spark.patterns.fact import DimensionLookup, build_fact

    tmp = tempfile.mkdtemp(prefix="star_")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    dim = build_dimension(
        spark, cust, target_path=f"{tmp}/dim_customer",
        natural_keys=["c_custkey"], surrogate_key="customer_sk", scd="1",
    )
    orders = read_table(spark, sf_dir, "orders")
    fact, _quarantined = build_fact(
        orders,
        grain=["o_orderkey"],
        lookups=[
            DimensionLookup(
                dimension=dim, fact_keys=["o_custkey"],
                dim_keys=["c_custkey"], surrogate_key="customer_sk",
                output_col="customer_sk",
            )
        ],
        measures={"is_large": "CAST(o_totalprice > 200000 AS INT)"},
    )
    return fact.select("o_orderkey", "customer_sk", "o_totalprice", "is_large")


STAR_FACT_SQL = """
WITH dim AS (
  SELECT c_custkey,
         CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_sk
  FROM (SELECT DISTINCT c_custkey FROM customer)
)
SELECT o_orderkey,
       COALESCE(dim.customer_sk, -1) AS customer_sk,
       o_totalprice,
       CAST(o_totalprice > 200000 AS INT) AS is_large
FROM orders LEFT JOIN dim ON dim.c_custkey = o_custkey
"""


def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation pattern (§2.9/§2.11) under oracle
    coverage: per-customer order counts and decimal-exact spend built
    from TWO date-split batches with merge_sum (each batch aggregates
    only its own rows; the merge folds them into running totals),
    hash-checked against a ONE-SHOT GROUP BY oracle — the replay-
    equals-full-pass proof for incremental rollups."""
    _prep(spark)
    from odibi_spark.patterns.aggregation import aggregate_incremental

    tmp = tempfile.mkdtemp(prefix="incragg_")
    orders = read_table(spark, sf_dir, "orders")
    kw = dict(
        target_path=f"{tmp}/rollup", grain=["o_custkey"],
        measures={
            "n_orders": "count(*)",
            "spend_d": f"sum(CAST(o_totalprice AS {DEC}))",
        },
        strategy="merge_sum",
    )
    aggregate_incremental(
        spark, orders.filter("o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"),
        **kw,
    )
    out = aggregate_incremental(
        spark, orders.filter("o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'"),
        **kw,
    )
    return out.select(
        "o_custkey", "n_orders", F.col("spend_d").cast("double").alias("spend")
    )


INCR_AGG_SQL = f"""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS spend
FROM orders GROUP BY o_custkey
"""


def delete_detection_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete detection / CDC-without-CDC (§2.9) under oracle coverage:
    the warehouse holds every customer; the new extract is missing the
    AUTOMOBILE segment (upstream deletes). Soft mode flags exactly
    those keys; the circuit breaker is configured above the deleted
    fraction so the run proceeds. Oracle: an anti-join membership
    flag."""
    _prep(spark)
    from odibi_spark.patterns.delete_detection import detect_deletes

    tmp = tempfile.mkdtemp(prefix="deldet_")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    cust.write.parquet(f"{tmp}/warehouse")
    shrunken = cust.filter("c_mktsegment <> 'AUTOMOBILE'")
    out = detect_deletes(
        spark, shrunken.select("c_custkey"),
        target_path=f"{tmp}/warehouse", keys=["c_custkey"], mode="soft",
        max_delete_percent=50.0,
    )
    return out.select("c_custkey", "c_mktsegment", "_is_deleted")


DELETE_DETECTION_SQL = """
SELECT c_custkey, c_mktsegment,
       (c_mktsegment = 'AUTOMOBILE') AS _is_deleted
FROM customer
"""


def validate_orders_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation engine (§2.10) under oracle coverage: six test types
    (not_null / accepted_values / range / regex_match / custom_sql /
    unique) over orders, all row-level checks in ONE aggregate pass;
    output is the per-test summary the engine reports. The oracle
    recomputes every failure count in SQL."""
    _prep(spark)
    from odibi_spark.validation import run_validation

    df = read_table(spark, sf_dir, "orders")
    tests = [
        {"name": "key_not_null", "type": "not_null", "column": "o_orderkey"},
        {"name": "status_accepted", "type": "accepted_values",
         "column": "o_orderstatus", "values": ["O", "F", "P"]},
        {"name": "price_range", "type": "range", "column": "o_totalprice",
         "min": 0, "max": 1_000_000},
        {"name": "priority_shape", "type": "regex_match",
         "column": "o_orderpriority", "pattern": "^[1-5]-"},
        {"name": "date_window", "type": "custom_sql",
         "condition": "o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'"},
        {"name": "key_unique", "type": "unique", "column": "o_orderkey"},
    ]
    outcome = run_validation(df, tests)
    return spark.createDataFrame(
        [
            (r.name, r.test_type, r.failed_rows, r.total_rows, r.passed)
            for r in outcome.results
        ],
        "test_name string, test_type string, failed_rows bigint, "
        "total_rows bigint, passed boolean",
    )


VALIDATE_ORDERS_SQL = """
WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders),
f AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS f_not_null,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS f_accepted,
    CAST(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                    OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS f_range,
    CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                    OR o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS f_regex,
    CAST(SUM(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1990-01-01 00:00:00')
                  THEN 1 ELSE 0 END) AS BIGINT) AS f_custom
  FROM orders
),
u AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS f_unique
  FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
)
SELECT 'key_not_null' AS test_name, 'not_null' AS test_type,
       f_not_null AS failed_rows, total AS total_rows,
       f_not_null = 0 AS passed FROM f, t
UNION ALL
SELECT 'status_accepted', 'accepted_values', f_accepted, total,
       f_accepted = 0 FROM f, t
UNION ALL
SELECT 'price_range', 'range', f_range, total, f_range = 0 FROM f, t
UNION ALL
SELECT 'priority_shape', 'regex_match', f_regex, total, f_regex = 0 FROM f, t
UNION ALL
SELECT 'date_window', 'custom_sql', f_custom, total, f_custom = 0 FROM f, t
UNION ALL
SELECT 'key_unique', 'unique', f_unique, total, f_unique = 0 FROM u, t
"""


def skew_salted_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join of events to an event_type dim on an extreme-skew
    key, then weighted revenue per type (§2.4 skew path)."""
    _prep(spark)
    from odibi_spark.operators.skew import salted_join_frames

    events = read_table(spark, sf_dir, "events")
    # dim: one row per event type with a derived weight — built from
    # the fact itself so the workload is self-contained and the DuckDB
    # oracle can regenerate it exactly
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("double"))
    )
    joined = salted_join_frames(
        events, dim, on=["event_type"], salt_buckets=8, how="inner"
    )
    return (
        joined.groupBy("event_type", "weight")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(f"CAST(value * weight AS {DEC})")).alias("wsum_d"),
        )
        .select(
            "event_type",
            "weight",
            "n_events",
            F.round(F.col("wsum_d").cast("double"), 4).alias("weighted_value"),
        )
        .orderBy("event_type")
    )


SKEW_JOIN_SQL = f"""
SELECT e.event_type,
       CAST(length(e.event_type) AS DOUBLE) AS weight,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(e.value * length(e.event_type) AS {DEC})) AS DOUBLE), 4)
         AS weighted_value
FROM events e
JOIN (SELECT DISTINCT event_type FROM events) d USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (§2.14 beyond reference): a click
    stream joined to a purchase stream on user_id with the purchase
    falling within 1 hour AFTER the click — both sides watermarked, the
    time bound in the join predicate, so buffered state stays bounded
    by rate x horizon at 100 TB/day. Inner join emits matches eagerly,
    so driving the finite source with availableNow yields exactly the
    batch interval-join result and the DuckDB oracle hash-matches."""
    _prep(spark)
    from odibi_spark.streaming import start_stream_write, streaming_interval_join

    ev = read_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="ssjoin_")
    # single-file sources: one micro-batch, no per-file scheduling churn
    ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/clicks")
    ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/purchases")

    clicks = spark.readStream.schema(
        "click_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    ).parquet(f"{tmp}/clicks")
    purchases = spark.readStream.schema(
        "user_id BIGINT, purchase_ts TIMESTAMP, value DOUBLE"
    ).parquet(f"{tmp}/purchases")
    joined = streaming_interval_join(
        clicks, purchases, keys=["user_id"], left_ts="ts",
        right_ts="purchase_ts", within="1 hour", how="inner",
    )
    name = f"attrib_{abs(hash(tmp)) % 100000}"
    # shuffle partitions fix the state-store partition count for the
    # life of the query: 8 is plenty for the harness volume (at real
    # scale this is sized to executor count BEFORE first start — it is
    # frozen into the checkpoint)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = start_stream_write(
            joined, format="memory", output_mode="append", query_name=name,
            checkpoint=f"{tmp}/ckpt", trigger={"availableNow": True},
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name).select(
        "click_id", "user_id", "ts", "purchase_ts", "value"
    )


CLICK_ATTRIB_SQL = """
SELECT c.event_id AS click_id, c.user_id, c.ts,
       p.ts AS purchase_ts, p.value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


def resample_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill (§2.6): per-user event values
    onto a dense 6-hour grid — bucket aggregate, per-group span grid
    via sequence+explode (no global calendar cross join), left join,
    forward fill over a per-user window. Gaps flagged."""
    _prep(spark)
    from odibi_spark.operators.window import resample_frames

    ev = read_table(spark, sf_dir, "events")
    out = resample_frames(
        ev,
        group_by=["user_id"],
        timestamp_column="ts",
        interval_seconds=21600,
        aggregations={
            "n_events": "count(*)",
            "avg_value": (
                f"round(cast(sum(cast(value as {DEC})) as double)"
                " / count(*), 4)"
            ),
        },
        fill_columns=["avg_value"],
        fill="ffill",
    )
    return out.select(
        "user_id",
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "is_gap",
        F.col("avg_value_ffill").alias("value_ffill"),
    )


RESAMPLE_SQL = f"""
WITH b AS (
  SELECT user_id,
         make_timestamp(CAST(floor(epoch(ts)/21600)*21600*1000000 AS BIGINT))
           AS bucket_ts,
         COUNT(*) AS n_events,
         round(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(*), 4)
           AS avg_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx
  FROM b GROUP BY 1
),
grid AS (
  SELECT user_id,
         unnest(generate_series(mn, mx, INTERVAL 6 HOUR)) AS bucket_ts
  FROM bounds
),
j AS (
  SELECT g.user_id, g.bucket_ts, b.n_events, b.avg_value
  FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.bucket_ts = g.bucket_ts
)
SELECT user_id, bucket_ts,
       COALESCE(n_events, 0) AS n_events,
       (n_events IS NULL) AS is_gap,
       last_value(avg_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM j
"""


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (beyond reference): first view -> first click
    after it -> first purchase after that, all within 7 days of the
    first view; per-step user counts + conversion."""
    _prep(spark)
    from odibi_spark.operators.analytics import funnel_counts

    ev = read_table(spark, sf_dir, "events")
    return funnel_counts(
        ev, user_col="user_id", ts_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"], within="7 days",
    )


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY 1
),
n AS (
  SELECT (SELECT COUNT(*) FROM s1) AS n1,
         (SELECT COUNT(*) FROM s2) AS n2,
         (SELECT COUNT(*) FROM s3) AS n3
)
SELECT CAST(1 AS INTEGER) AS step_index, 'view' AS step, n1 AS n_users,
       round(CAST(n1 AS DOUBLE) / n1, 6) AS conversion_from_first FROM n
UNION ALL
SELECT 2, 'click', n2, round(CAST(n2 AS DOUBLE) / n1, 6) FROM n
UNION ALL
SELECT 3, 'purchase', n3, round(CAST(n3 AS DOUBLE) / n1, 6) FROM n
"""


def cohort_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (beyond reference): users bucketed by first
    active day; matrix of (cohort_day, days_since, active users)."""
    _prep(spark)
    from odibi_spark.operators.analytics import cohort_retention_frames

    ev = read_table(spark, sf_dir, "events")
    return cohort_retention_frames(
        ev, user_col="user_id", ts_col="ts", period="day"
    )


COHORT_SQL = """
WITH ev AS (SELECT user_id AS u, date_trunc('day', ts) AS p FROM events),
c AS (SELECT u, MIN(p) AS cohort FROM ev GROUP BY 1),
a AS (SELECT DISTINCT u, p FROM ev)
SELECT cohort AS cohort_period,
       CAST(date_diff('day', cohort, p) AS BIGINT) AS period_index,
       COUNT(*) AS n_active
FROM a JOIN c USING (u)
GROUP BY 1, 2
"""


def outlier_events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging (beyond reference): events
    whose value is >3 sample standard deviations from their event
    type's mean. Stats side is O(groups) and broadcast — the fact
    never shuffles."""
    _prep(spark)
    from odibi_spark.operators.analytics import zscore_outliers

    ev = read_table(spark, sf_dir, "events")
    out = zscore_outliers(
        ev, group_by=["event_type"], value_col="value", threshold=3.0
    )
    return out.filter("is_outlier").select(
        "event_id", "event_type", "value",
        F.round("z_score", 3).alias("z3"),
    )


OUTLIER_SQL = """
WITH s AS (
  SELECT event_type, AVG(value) AS m, stddev_samp(value) AS sd
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - s.m) / s.sd, 3) AS z3
FROM events e JOIN s USING (event_type)
WHERE s.sd > 0 AND abs((e.value - s.m) / s.sd) > 3
"""


def resample_interp_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation twin of resample_user_events: gaps between
    two observed buckets are linear in bucket time; leading gaps stay
    null, trailing gaps carry forward.

    The grid + gap flags come from the resample operator (fill="none");
    the interpolated value is emitted in FIXED-POINT MICRO-UNITS
    (value x 1e6 as BIGINT, integer DIV) — double round() of a
    non-terminating interpolated value is engine-ambiguous at half
    boundaries (Spark rounds the shortest decimal string, DuckDB the
    exact binary), while integer arithmetic hashes identically
    everywhere. Same convention as the packing cumsums (integer DIV
    over doubles)."""
    _prep(spark)
    from pyspark.sql.window import Window as W

    from odibi_spark.operators.window import resample_frames

    ev = read_table(spark, sf_dir, "events")
    grid = resample_frames(
        ev,
        group_by=["user_id"],
        timestamp_column="ts",
        interval_seconds=21600,
        aggregations={
            # 4-decimal fixed point: exact integer on both engines
            "avg_i": (
                f"cast(round(cast(sum(cast(value as {DEC})) as double)"
                " / count(*) * 10000) as bigint)"
            ),
        },
        fill="none",
    )
    back = (
        W.partitionBy("user_id").orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id").orderBy("bucket_ts")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    t = F.unix_timestamp("bucket_ts")
    obs_t = F.when(F.col("avg_i").isNotNull(), t)
    out = (
        grid.withColumn("__pv", F.last("avg_i", ignorenulls=True).over(back))
        .withColumn("__pt", F.last(obs_t, ignorenulls=True).over(back))
        .withColumn("__nv", F.first("avg_i", ignorenulls=True).over(fwd))
        .withColumn("__nt", F.first(obs_t, ignorenulls=True).over(fwd))
        .withColumn(
            "__j", ((t - F.col("__pt")) / F.lit(21600)).cast("long")
        )
        .withColumn(
            "__k",
            ((F.col("__nt") - F.col("__pt")) / F.lit(21600)).cast("long"),
        )
    )
    micro = (
        F.when(F.col("avg_i").isNotNull(), F.col("avg_i") * 100)
        .when(
            F.col("__pv").isNotNull() & F.col("__nv").isNotNull(),
            F.expr(
                "CAST((__pv * (__k - __j) + __nv * __j) * 100 DIV __k"
                " AS BIGINT)"
            ),
        )
        .otherwise(F.col("__pv") * 100)
    )
    return out.select(
        "user_id",
        "bucket_ts",
        "is_gap",
        micro.cast("bigint").alias("value_interp_micro"),
    )


RESAMPLE_INTERP_SQL = f"""
WITH b AS (
  SELECT user_id,
         make_timestamp(CAST(floor(epoch(ts)/21600)*21600*1000000 AS BIGINT))
           AS bucket_ts,
         CAST(round(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(*)
                    * 10000) AS BIGINT) AS avg_i
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx
  FROM b GROUP BY 1
),
grid AS (
  SELECT user_id,
         unnest(generate_series(mn, mx, INTERVAL 6 HOUR)) AS bucket_ts
  FROM bounds
),
j AS (
  SELECT g.user_id, g.bucket_ts, b.avg_i
  FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.bucket_ts = g.bucket_ts
),
w AS (
  SELECT user_id, bucket_ts, avg_i,
         last_value(avg_i IGNORE NULLS) OVER back AS pv,
         last_value(CASE WHEN avg_i IS NOT NULL
                         THEN CAST(floor(epoch(bucket_ts)) AS BIGINT) END
                    IGNORE NULLS) OVER back AS pt,
         first_value(avg_i IGNORE NULLS) OVER fwd AS nv,
         first_value(CASE WHEN avg_i IS NOT NULL
                          THEN CAST(floor(epoch(bucket_ts)) AS BIGINT) END
                     IGNORE NULLS) OVER fwd AS nt,
         CAST(floor(epoch(bucket_ts)) AS BIGINT) AS t
  FROM j
  WINDOW back AS (PARTITION BY user_id ORDER BY bucket_ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY user_id ORDER BY bucket_ts
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket_ts,
       (avg_i IS NULL) AS is_gap,
       CAST(CASE WHEN avg_i IS NOT NULL THEN avg_i * 100
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                   -- all-BIGINT operands: // is integer floor division
                   -- (on DOUBLEs DuckDB's // is plain division)
                   THEN (pv * (CAST((nt - pt) AS BIGINT) // 21600
                               - CAST((t - pt) AS BIGINT) // 21600)
                         + nv * (CAST((t - pt) AS BIGINT) // 21600)) * 100
                        // (CAST((nt - pt) AS BIGINT) // 21600)
                 ELSE pv * 100 END AS BIGINT) AS value_interp_micro
FROM w
"""


def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (alpha=1/3, adjust=False
    semantics) via ewma_scan — the blocked scaled-cumsum closed form
    in pure JVM window algebra (no Python boundary; ~8x faster than
    the applyInPandas recursion at this group-count, and the 100-TB
    path since it has no per-group Arrow batch limit). The oracle is
    the unblocked closed form y_t = (1-a)^t * cumsum(x_i * a/(1-a)^i)
    — overflow-prone past ~1700 points (why ewma_scan blocks) but
    exact at this series length; round(4) absorbs the ~1e-12 relative
    gap between the float paths. alpha is 1/3 ON PURPOSE:
    with a terminating-decimal alpha (0.3), early-series EWMA values
    terminate at exactly five decimals, so round(·,4) sits ON the
    .00005 midpoint and the engines disagree (Spark rounds the
    shortest decimal string, DuckDB the binary value) — 31 structural
    flips at sf0.01. With 1/3 every non-trivial value is
    non-terminating and midpoint hits have measure zero."""
    _prep(spark)
    from odibi_spark.operators.analytics import ewma_scan

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    out = ewma_scan(
        ev, group_by=["user_id"], ts_col="ts", value_col="value",
        alpha=1.0 / 3.0, tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id", "event_id", F.round("ewma", 4).alias("ewma4")
    )


EWMA_SQL = """
WITH o AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
u AS (
  SELECT user_id, event_id, rn,
         CASE WHEN rn = 1 THEN value / pow(2.0/3.0, 1)
              ELSE (1.0/3.0) * value / pow(2.0/3.0, rn) END AS uval
  FROM o
),
s AS (
  SELECT user_id, event_id, rn,
         SUM(uval) OVER (PARTITION BY user_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS su
  FROM u
)
SELECT user_id, event_id, round(pow(2.0/3.0, rn) * su, 4) AS ewma4
FROM s
"""


def decile_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-rank breadth (§2.6): spend deciles per customer via the
    registered global_rank operator — the DISTRIBUTED two-pass rank
    (range-partition + driver prefix-sum offsets, see
    operators/rank.py), so the global ntile + percent_rank run with
    ZERO ``Exchange SinglePartition`` even though the ranked set (the
    per-customer spend dimension) grows linearly with SF (VERDICT r5
    weak-plan fix). The share-of-total scalar piggybacks on the same
    O(partitions) collect via ``attach_totals`` — no separate 1-row
    global aggregate either. Ties broken by custkey so both engines
    rank identically; output pinned byte-identical to the plain-window
    twin in tests/test_rank.py."""
    _prep(spark)
    import odibi_spark.operators  # noqa: F401 — registers transforms
    from odibi_spark.context import Context, EngineContext
    from odibi_spark.registry import get_registry

    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.expr(f"CAST(o_totalprice AS {DEC})")).alias("spend_d")
    )
    reg = get_registry()
    ec = EngineContext(Context(spark), spend)
    ec = reg.apply(
        "global_rank", ec,
        {
            "order_by": ["spend_d", "o_custkey"],
            "columns": {
                "decile": {"function": "ntile", "buckets": 10},
                "pr": {"function": "percent_rank"},
            },
            "attach_totals": {"total_d": "spend_d"},
        },
    )
    return (
        ec.df
        .select(
            "o_custkey",
            F.col("spend_d").cast("double").alias("spend"),
            "decile",
            F.round("pr", 6).alias("pct_rank"),
            F.round(
                F.col("spend_d").cast("double")
                / F.col("total_d").cast("double"),
                9,
            ).alias("share_of_total"),
        )
    )


DECILE_SPEND_SQL = f"""
WITH s AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS {DEC})) AS spend_d
  FROM orders GROUP BY 1
),
t AS (SELECT SUM(spend_d) AS total_d FROM s)
SELECT o_custkey,
       CAST(spend_d AS DOUBLE) AS spend,
       CAST(ntile(10) OVER w AS INTEGER) AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(CAST(spend_d AS DOUBLE) / CAST(total_d AS DOUBLE), 9)
         AS share_of_total
FROM s, t
WINDOW w AS (ORDER BY spend_d, o_custkey)
"""


def snapshot_cdc_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CDC (§2.9): the warehouse holds yesterday's customer
    extract; today's snapshot deterministically drops every 13th key
    (deletes), re-segments every remaining 7th (updates), and appends
    shifted copies of every remaining 11th (inserts). snapshot_diff
    classifies the full-outer key join by map-side row hash; unchanged
    rows never leave the join."""
    _prep(spark)
    from odibi_spark.patterns.snapshot_cdc import snapshot_diff

    old = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    kept = old.filter("c_custkey % 13 <> 0")
    new = kept.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("MOVED")).otherwise(
            F.col("c_mktsegment")
        ),
    ).unionByName(
        kept.filter("c_custkey % 11 = 0").select(
            (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
            "c_name",
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    return snapshot_diff(old, new, keys=["c_custkey"])


SNAPSHOT_CDC_SQL = """
WITH old AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
newsnap AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, c_name, 'NEW'
  FROM customer WHERE c_custkey % 13 <> 0 AND c_custkey % 11 = 0
),
j AS (
  SELECT COALESCE(n.c_custkey, o.c_custkey) AS k,
         n.c_name AS nn, n.c_mktsegment AS ns,
         o.c_name AS onm, o.c_mktsegment AS osg,
         (n.c_custkey IS NULL) AS isdel,
         (o.c_custkey IS NULL) AS isins
  FROM newsnap n FULL OUTER JOIN old o ON n.c_custkey = o.c_custkey
)
SELECT k AS c_custkey,
       CASE WHEN isdel THEN onm ELSE nn END AS c_name,
       CASE WHEN isdel THEN osg ELSE ns END AS c_mktsegment,
       CASE WHEN isins THEN 'insert' WHEN isdel THEN 'delete'
            ELSE 'update' END AS _change_type
FROM j
WHERE isins OR isdel OR ns <> osg OR nn <> onm
"""


def outlier_events_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier flagging per event type — the
    modified z-score that a single extreme value cannot inflate.
    Spark percentile == DuckDB quantile_cont (same interpolation), so
    medians hash-match; the score ratio is non-terminating and rounds
    stably."""
    _prep(spark)
    from odibi_spark.operators.analytics import mad_outliers

    ev = read_table(spark, sf_dir, "events")
    out = mad_outliers(
        ev, group_by=["event_type"], value_col="value", threshold=3.5
    )
    return out.filter("is_outlier").select(
        "event_id", "event_type", "value",
        F.round("robust_z", 3).alias("rz3"),
    )


OUTLIER_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       round(0.6745 * (e.value - m.med) / d.mad, 3) AS rz3
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE d.mad > 0 AND abs(0.6745 * (e.value - m.med) / d.mad) > 3.5
"""


def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) match join: part names matched against a
    deterministically dirtied copy (char substitution / appended char /
    unchanged, cycling by partkey) with max_distance=1 — the anchor
    blocking (prefix OR suffix equi-join) is complete at one edit, so
    every planted pair survives and the oracle mirrors the same
    blocking + levenshtein refine. Distances are integers: no float
    hazard anywhere."""
    _prep(spark)
    from odibi_spark.operators.fuzzy import fuzzy_match_join

    # dedupe to DISTINCT names first (min key as the entity id) — the
    # synthetic part names repeat heavily, and matching raw rows would
    # cross-product every duplicate-name cluster (6.4M pairs at sf0.1
    # for ~20k planted edits); resolving entities, not rows, is also
    # how a real match pipeline runs
    part = (
        read_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select("p_partkey", "p_name")
    )
    dirty = part.select(
        (F.col("p_partkey") + F.lit(5_000_000)).alias("d_key"),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(
                F.substring("p_name", 1, 9),
                F.lit("X"),
                F.substring(F.col("p_name"), 11, 1000),
            ),
        )
        .when(F.col("p_partkey") % 3 == 1, F.concat(F.col("p_name"), F.lit("q")))
        .otherwise(F.col("p_name"))
        .alias("d_name"),
    )
    # 8-char anchors: part names open with a ~10-word color vocabulary,
    # so 4-char prefixes bucket ~2500 wide (100M candidate pairs at
    # sf0.1, 30s); reaching into the second word cuts buckets ~100x.
    # Names are >=19 chars, so 8-char anchors stay complete at 1 edit.
    out = fuzzy_match_join(
        part, dirty, left_col="p_name", right_col="d_name",
        max_distance=1, anchor=8,
    )
    return out.select("p_partkey", "d_key", "edit_distance")


FUZZY_MATCH_SQL = """
WITH ent AS (
  SELECT MIN(p_partkey) AS p_partkey, p_name FROM part GROUP BY p_name
),
dirty AS (
  SELECT p_partkey + 5000000 AS d_key,
         CASE WHEN p_partkey % 3 = 0
                THEN concat(substring(p_name, 1, 9), 'X',
                            substring(p_name, 11, 1000))
              WHEN p_partkey % 3 = 1 THEN concat(p_name, 'q')
              ELSE p_name END AS d_name
  FROM ent
),
l AS (SELECT p_partkey, lower(trim(p_name)) AS ln FROM ent),
r AS (SELECT d_key, lower(trim(d_name)) AS rn FROM dirty),
cands AS (
  SELECT l.p_partkey, r.d_key, l.ln, r.rn
  FROM l JOIN r ON substring(l.ln, 1, 8) = substring(r.rn, 1, 8)
  UNION
  SELECT l.p_partkey, r.d_key, l.ln, r.rn
  FROM l JOIN r ON substring(l.ln, length(l.ln) - 7, 8)
                   = substring(r.rn, length(r.rn) - 7, 8)
)
SELECT p_partkey, d_key,
       CAST(levenshtein(ln, rn) AS INTEGER) AS edit_distance
FROM cands
WHERE levenshtein(ln, rn) <= 1
"""


def spatial_customers_near_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spatial near-join: customers within 500 km of a supplier site,
    coordinates synthesized deterministically from the keys (exact
    2-decimal rationals, identical in both engines). Grid blocking
    (one equi-join on radius-sized cells, supplier side exploded to
    its 3x9 wrapped neighborhood) + haversine refine — never |C| x |S|."""
    _prep(spark)
    from odibi_spark.operators.spatial import grid_near_join

    def points(df, key, prefix):
        return df.select(
            F.col(key).alias(f"{prefix}_id"),
            (((F.col(key) * 37) % 12000) / 100.0 - 60.0).alias(f"{prefix}_lat"),
            (((F.col(key) * 73) % 36000) / 100.0 - 180.0).alias(f"{prefix}_lng"),
        )

    cust = points(read_table(spark, sf_dir, "customer"), "c_custkey", "c")
    supp = points(read_table(spark, sf_dir, "supplier"), "s_suppkey", "s")
    out = grid_near_join(
        cust, supp, left_lat="c_lat", left_lng="c_lng",
        right_lat="s_lat", right_lng="s_lng", radius_m=500_000.0,
    )
    return out.select(
        "c_id", "s_id", F.round("distance_m", 1).alias("dist_m1")
    )


SPATIAL_NEAR_SQL = """
WITH cust AS (
  SELECT c_custkey AS c_id,
         ((c_custkey * 37) % 12000) / 100.0 - 60.0 AS c_lat,
         ((c_custkey * 73) % 36000) / 100.0 - 180.0 AS c_lng
  FROM customer
),
supp AS (
  SELECT s_suppkey AS s_id,
         ((s_suppkey * 37) % 12000) / 100.0 - 60.0 AS s_lat,
         ((s_suppkey * 73) % 36000) / 100.0 - 180.0 AS s_lng
  FROM supplier
)
SELECT c_id, s_id,
       round(2.0 * 6371000.0 * asin(sqrt(
         sin(radians(s_lat - c_lat) / 2) * sin(radians(s_lat - c_lat) / 2)
         + cos(radians(c_lat)) * cos(radians(s_lat))
           * sin(radians(s_lng - c_lng) / 2) * sin(radians(s_lng - c_lng) / 2)
       )), 1) AS dist_m1
FROM cust JOIN supp
  ON 2.0 * 6371000.0 * asin(sqrt(
       sin(radians(s_lat - c_lat) / 2) * sin(radians(s_lat - c_lat) / 2)
       + cos(radians(c_lat)) * cos(radians(s_lat))
         * sin(radians(s_lng - c_lng) / 2) * sin(radians(s_lng - c_lng) / 2)
     )) <= 500000.0
"""


QUERIES.update(
    {"spatial_customers_near_suppliers": spatial_customers_near_suppliers}
)
ORACLES.update({"spatial_customers_near_suppliers": SPATIAL_NEAR_SQL})
QUERIES.update({"fuzzy_match_parts": fuzzy_match_parts})
ORACLES.update({"fuzzy_match_parts": FUZZY_MATCH_SQL})
QUERIES.update({"outlier_events_mad": outlier_events_mad})
ORACLES.update({"outlier_events_mad": OUTLIER_MAD_SQL})
QUERIES.update({"snapshot_cdc_customers": snapshot_cdc_customers})
ORACLES.update({"snapshot_cdc_customers": SNAPSHOT_CDC_SQL})
QUERIES.update({"decile_customer_spend": decile_customer_spend})
ORACLES.update({"decile_customer_spend": DECILE_SPEND_SQL})
QUERIES.update({"ewma_user_values": ewma_user_values})
ORACLES.update({"ewma_user_values": EWMA_SQL})
QUERIES.update({"resample_interp_user_events": resample_interp_user_events})
ORACLES.update({"resample_interp_user_events": RESAMPLE_INTERP_SQL})
def conversion_latency_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator composition: funnel chain -> completed conversions ->
    interpolated quartiles of view-to-purchase latency. One funnel
    pass + one 1-row aggregate; latencies are exact integer seconds so
    the interpolated quantiles hash-match DuckDB's quantile_cont."""
    _prep(spark)
    from odibi_spark.operators.analytics import funnel_frames

    ev = read_table(spark, sf_dir, "events")
    fr = funnel_frames(
        ev, user_col="user_id", ts_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"], within="7 days",
    )
    lat = fr.filter("step_3_purchase_ts IS NOT NULL").select(
        (
            F.unix_timestamp("step_3_purchase_ts")
            - F.unix_timestamp("step_1_view_ts")
        ).alias("latency_s")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile(latency_s, 0.25)").alias("p25_s"),
        F.expr("percentile(latency_s, 0.5)").alias("p50_s"),
        F.expr("percentile(latency_s, 0.75)").alias("p75_s"),
    )


CONVERSION_LATENCY_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY 1
),
lat AS (
  SELECT CAST(floor(epoch(t3)) AS BIGINT)
         - CAST(floor(epoch(t1)) AS BIGINT) AS latency_s
  FROM s3 JOIN s1 USING (user_id)
)
SELECT COUNT(*) AS n_converted,
       quantile_cont(latency_s, 0.25) AS p25_s,
       quantile_cont(latency_s, 0.5) AS p50_s,
       quantile_cont(latency_s, 0.75) AS p75_s
FROM lat
"""


QUERIES.update({"conversion_latency_quartiles": conversion_latency_quartiles})
ORACLES.update({"conversion_latency_quartiles": CONVERSION_LATENCY_SQL})
QUERIES.update({"funnel_view_click_purchase": funnel_view_click_purchase})
ORACLES.update({"funnel_view_click_purchase": FUNNEL_SQL})
QUERIES.update({"cohort_daily_retention": cohort_daily_retention})
ORACLES.update({"cohort_daily_retention": COHORT_SQL})
QUERIES.update({"outlier_events_zscore": outlier_events_zscore})
ORACLES.update({"outlier_events_zscore": OUTLIER_SQL})
QUERIES.update({"resample_user_events": resample_user_events})
ORACLES.update({"resample_user_events": RESAMPLE_SQL})
QUERIES.update({"streaming_click_attribution": streaming_click_attribution})
ORACLES.update({"streaming_click_attribution": CLICK_ATTRIB_SQL})
QUERIES.update({"skew_salted_event_join": skew_salted_event_join})
ORACLES.update({"skew_salted_event_join": SKEW_JOIN_SQL})
QUERIES.update({"validate_orders_quality": validate_orders_quality})
ORACLES.update({"validate_orders_quality": VALIDATE_ORDERS_SQL})
QUERIES.update({"star_fact_orders": star_fact_orders})
ORACLES.update({"star_fact_orders": STAR_FACT_SQL})
QUERIES.update({"delete_detection_customers": delete_detection_customers})
ORACLES.update({"delete_detection_customers": DELETE_DETECTION_SQL})
QUERIES.update({"incremental_agg_orders": incremental_agg_orders})
ORACLES.update({"incremental_agg_orders": INCR_AGG_SQL})


def transition_matrix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    (lead window + conditional normalization); last event of each user
    transitions to '<end>'. Counts are exact and the probability is
    one BIGINT/BIGINT double division — identical IEEE result in both
    engines, so the matrix hash-matches without rounding."""
    _prep(spark)
    from odibi_spark.operators.analytics import transition_matrix_frames

    ev = read_table(spark, sf_dir, "events")
    return transition_matrix_frames(
        ev, group_by=["user_id"], ts_col="ts", type_col="event_type",
        tiebreak_cols=["event_id"], terminal_label="<end>",
    )


TRANSITION_MATRIX_SQL = """
WITH nxt AS (
  SELECT event_type AS from_type,
         coalesce(
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id),
           '<end>') AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM nxt GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / SUM(n_transitions) OVER (PARTITION BY from_type)
         AS p_transition
FROM c
"""

QUERIES.update({"transition_matrix_events": transition_matrix_events})
ORACLES.update({"transition_matrix_events": TRANSITION_MATRIX_SQL})


def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (o_custkey, o_orderdate):
    the open-parquet equivalent of Delta OPTIMIZE ZORDER (reference
    spark_engine.py:1390-1424). Uniform 2^8 buckets per column from
    the data's min/max, bits interleaved into one long — the oracle
    recomputes the identical bit math in DuckDB, pinning bucket
    scaling, date handling, and the interleave pattern."""
    _prep(spark)
    from odibi_spark.operators.layout import zorder_key

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return zorder_key(orders, ["o_custkey", "o_orderdate"], bits=8).select(
        "o_orderkey", "z_key"
    )


def _zorder_oracle_sql(bits: int = 8) -> str:
    terms = []
    for j, b in enumerate(("bc", "bd")):
        for i in range(bits):
            terms.append(f"((({b} >> {i}) & 1) << {i * 2 + j})")
    interleave = " + ".join(terms)
    n = 1 << bits
    return f"""
WITH s AS (
  SELECT MIN(CAST(o_custkey AS DOUBLE)) AS lo_c,
         MAX(CAST(o_custkey AS DOUBLE)) AS hi_c,
         MIN(CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)) AS lo_d,
         MAX(CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)) AS hi_d
  FROM orders
),
b AS (
  SELECT o_orderkey,
         CAST(least({n - 1}, greatest(0, floor(
           (CAST(o_custkey AS DOUBLE) - lo_c) / (hi_c - lo_c) * {n}
         ))) AS BIGINT) AS bc,
         CAST(least({n - 1}, greatest(0, floor(
           (CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE) - lo_d)
             / (hi_d - lo_d) * {n}
         ))) AS BIGINT) AS bd
  FROM orders, s
)
SELECT o_orderkey, CAST({interleave} AS BIGINT) AS z_key FROM b
"""


QUERIES.update({"zorder_key_orders": zorder_key_orders})
ORACLES.update({"zorder_key_orders": _zorder_oracle_sql()})


def psychrometrics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form psychrometrics (Magnus/ASHRAE/Stull — the native
    twin of the CoolProp-gated `psychrometrics` transform) over
    deterministic sensor-like states derived from events. Outputs
    rounded to 6 decimals: exp/ln/atan differ by ~1 ulp between JVM
    and libm, same guard as quality_score."""
    _prep(spark)
    from odibi_spark.operators.thermo import with_psychrometrics_native

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        (F.pmod(F.col("user_id"), F.lit(35)) + F.lit(5.0)).alias("t_c"),
        ((F.pmod(F.col("event_id"), F.lit(90)) + F.lit(5.0)) / F.lit(100.0)).alias("rh"),
    )
    out = with_psychrometrics_native(
        ev, dry_bulb_c_col="t_c", relative_humidity_col="rh"
    )
    return out.select(
        "event_id",
        F.round("psy_humidity_ratio", 6).alias("w6"),
        F.round("psy_dew_point_c", 6).alias("td6"),
        F.round("psy_enthalpy_kj_kg", 6).alias("h6"),
        F.round("psy_wet_bulb_c", 6).alias("twb6"),
    )


PSYCHRO_SQL = """
WITH s AS (
  SELECT event_id,
         CAST(user_id % 35 + 5.0 AS DOUBLE) AS t,
         CAST((event_id % 90 + 5.0) / 100.0 AS DOUBLE) AS rh
  FROM events
),
v AS (
  SELECT event_id, t, rh,
         rh * (610.94 * exp(17.625 * t / (t + 243.04))) AS vp,
         ln(rh) + 17.625 * t / (243.04 + t) AS g,
         rh * 100.0 AS rp
  FROM s
)
SELECT event_id,
       round(0.621945 * vp / (101325.0 - vp), 6) AS w6,
       round(243.04 * g / (17.625 - g), 6) AS td6,
       round(1.006 * t + (0.621945 * vp / (101325.0 - vp))
               * (2501.0 + 1.86 * t), 6) AS h6,
       round(t * atan(0.151977 * sqrt(rp + 8.313659)) + atan(t + rp)
             - atan(rp - 1.676331)
             + 0.00391838 * pow(rp, 1.5) * atan(0.023101 * rp)
             - 4.686035, 6) AS twb6
FROM v
"""

QUERIES.update({"psychrometrics_events": psychrometrics_events})
ORACLES.update({"psychrometrics_events": PSYCHRO_SQL})


def streaming_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EWMA oracle (§2.14, VERDICT r5 task 8): events split
    into three ts-range waves; each wave is ingested by a SEPARATE
    availableNow run against the same checkpoint, so the per-user
    recursion is seeded across micro-batch AND restart boundaries
    (state reloads from the checkpoint between runs). The appended
    update-mode output must hash-equal the one-shot closed-form EWMA —
    the same oracle the batch ``ewma_user_values`` runs. alpha=1/3 is
    non-terminating in binary so round(.,4) midpoint flips have
    measure zero (SURVEY §7.3 rounding note)."""
    _prep(spark)
    import shutil

    from odibi_spark.streaming import start_stream_write
    from odibi_spark.streaming.core import stateful_ewma

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    lo, hi = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    span = hi - lo
    cut1 = lo + span / 3
    cut2 = lo + 2 * span / 3
    tmp = tempfile.mkdtemp(prefix="sewma_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    os.makedirs(src)
    waves = [
        ev.filter(F.col("ts") < F.lit(cut1)),
        ev.filter((F.col("ts") >= F.lit(cut1)) & (F.col("ts") < F.lit(cut2))),
        ev.filter(F.col("ts") >= F.lit(cut2)),
    ]

    def appender(batch: DataFrame, _epoch: int) -> None:
        batch.write.mode("append").parquet(out)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for i, w in enumerate(waves):
            # land wave i as one file, then drive the stream to drain it:
            # sequential availableNow runs make batch composition (and
            # hence the seeded recursion order) fully deterministic
            w.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/w{i}")
            part = next(
                p for p in os.listdir(f"{tmp}/w{i}")
                if p.endswith(".parquet") and not p.startswith(("_", "."))
            )
            shutil.copy(f"{tmp}/w{i}/{part}", f"{src}/wave{i}.parquet")
            stream = spark.readStream.schema(
                "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE"
            ).parquet(src)
            ew = stateful_ewma(
                stream, keys=["user_id"], ts_col="ts", value_col="value",
                alpha=1.0 / 3.0, tiebreak_cols=["event_id"],
            )
            q = start_stream_write(
                ew, checkpoint=ckpt, output_mode="update",
                foreach_batch=appender, trigger={"availableNow": True},
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out).select(
        "user_id", "event_id", F.round("ewma", 4).alias("ewma4")
    )


def streaming_shards_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming shard writer oracle (§2.13/2.14, VERDICT r5 task 8):
    documents arrive as three files (slice = doc_id % 3), one
    micro-batch each (maxFilesPerTrigger=1); each batch packs ITS OWN
    docs into token-balanced shards under batch_id=<epoch>/shard_id=<k>.
    The readback keys every row by the data-derived slice (not the
    epoch — file pickup order is scheduler-dependent, slice content is
    not), so the shard assignment hash-matches a per-slice SQL pack:
    shard_id = (exclusive running token sum over doc_id order) DIV
    tokens_per_shard."""
    _prep(spark)
    from odibi_spark.llm import text
    from odibi_spark.streaming.core import streaming_shard_writer

    docs = text.with_token_counts(
        read_table(spark, sf_dir, "documents")
    ).select("doc_id", "ws_tokens")
    tmp = tempfile.mkdtemp(prefix="sshards_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    os.makedirs(src)
    import shutil

    for i in range(3):
        sl = docs.filter(F.col("doc_id") % 3 == i)
        sl.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/s{i}")
        part = next(
            p for p in os.listdir(f"{tmp}/s{i}")
            if p.endswith(".parquet") and not p.startswith(("_", "."))
        )
        shutil.copy(f"{tmp}/s{i}/{part}", f"{src}/slice{i}.parquet")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = streaming_shard_writer(
            spark.readStream.schema("doc_id BIGINT, ws_tokens BIGINT")
            .option("maxFilesPerTrigger", "1").parquet(src),
            path=out, checkpoint=ckpt, token_col="ws_tokens",
            tokens_per_shard=20_000, order_col="doc_id", id_col="doc_id",
            format="json",
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.json(out).select(
        "doc_id",
        (F.col("doc_id") % 3).alias("slice"),
        F.col("shard_id").cast("long").alias("shard_id"),
        F.col("ws_tokens").alias("n_tokens"),
    )


STREAMING_EWMA_SQL = EWMA_SQL

STREAMING_SHARDS_SQL = """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens,
         doc_id % 3 AS slice
  FROM documents
),
c AS (
  SELECT doc_id, slice, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY slice ORDER BY doc_id)
           - n_tokens AS cb
  FROM d
)
SELECT doc_id, slice, CAST(cb // 20000 AS BIGINT) AS shard_id, n_tokens
FROM c
"""

QUERIES.update({
    "streaming_ewma_user_values": streaming_ewma_user_values,
    "streaming_shards_docs": streaming_shards_docs,
})
ORACLES.update({
    "streaming_ewma_user_values": STREAMING_EWMA_SQL,
    "streaming_shards_docs": STREAMING_SHARDS_SQL,
})


def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge pattern (§2.9, reference odibi/transformers/
    merge_transformer.py:18-640): replay all three strategies against
    one parquet target — initial load, conditional upsert (only rows
    whose incoming balance is HIGHER update), delete_match (GDPR-style
    key erasure), then append_only (re-insert-if-absent restores the
    deleted keys at their original balance). The final table state is
    fully determined by customer, so DuckDB can express it as one CASE.
    """
    _prep(spark)
    from odibi_spark.patterns.merge import merge_apply

    path = f"{tempfile.mkdtemp()}/merged"
    cust = read_table(spark, sf_dir, "customer")
    merge_apply(spark, cust, target_path=path, keys=["c_custkey"])
    # conditional upsert: %3==0 rows arrive LOWER (-50) and must NOT
    # update; the rest arrive +100 and do
    b1 = cust.filter(F.col("c_custkey") % 5 == 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") - 50)
        .otherwise(F.col("c_acctbal") + 100),
    )
    merge_apply(
        spark, b1, target_path=path, keys=["c_custkey"],
        strategy="upsert", update_condition="s.c_acctbal > t.c_acctbal",
    )
    merge_apply(
        spark, cust.filter(F.col("c_custkey") % 11 == 0),
        target_path=path, keys=["c_custkey"], strategy="delete_match",
    )
    final = merge_apply(
        spark, cust, target_path=path, keys=["c_custkey"],
        strategy="append_only",
    )
    return final.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
    )


MERGE_UPSERT_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(CASE WHEN c_custkey % 5 = 0 AND c_custkey % 3 <> 0
                               AND c_custkey % 11 <> 0
                          THEN c_acctbal + 100 ELSE c_acctbal END
                     AS {DEC})) AS DOUBLE) AS total_bal
FROM customer GROUP BY c_mktsegment
"""


#: pinned "now" for the catalog-health workloads: 1998-08-15 UTC as
#: pure day arithmetic, matching how both engines derive run epochs
_HEALTH_REF_DAYS = 10453  # days from 1970-01-01 to 1998-08-15
_HEALTH_REF = _HEALTH_REF_DAYS * 86400.0


def _orders_as_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic meta_runs frame derived from orders: one run per
    order, pipeline = order priority, failure when orderkey % 4 == 0.
    Epochs via tz-free day arithmetic (datediff * 86400)."""
    orders = read_table(spark, sf_dir, "orders")
    started = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("double")
        * 86400.0
    )
    return orders.select(
        F.col("o_orderkey").cast("string").alias("run_id"),
        F.col("o_orderpriority").alias("pipeline"),
        F.lit("main").alias("node"),
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("failed"))
        .otherwise(F.lit("success")).alias("status"),
        F.col("o_custkey").alias("rows_written"),
        F.lit(None).cast("string").alias("error"),
        F.lit(3600.0).alias("duration_s"),
        started.alias("started_at"),
        (started + 3600.0).alias("finished_at"),
    )


#: shared DuckDB CTE mirroring _orders_as_runs + the per-run rollup
_RUNS_CTE = """
runs AS (
  SELECT o_orderkey AS run_id, o_orderpriority AS pipeline,
         CASE WHEN o_orderkey % 4 = 0 THEN 0 ELSE 1 END AS ok,
         o_custkey AS rows_written,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           * 86400.0 + 3600.0 AS finished_at
  FROM orders
)
"""


def pipeline_health_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog observability (§ periphery, reference odibi/catalog.py
    meta_pipeline_health + derived_updater): drive the REAL
    Catalog.pipeline_health aggregation over a runs table derived
    deterministically from orders, with a pinned reference time so the
    7d/30d windows are stable."""
    _prep(spark)
    from odibi_spark.catalog import Catalog

    root = tempfile.mkdtemp()
    _orders_as_runs(spark, sf_dir).write.mode("overwrite").parquet(
        f"{root}/meta_runs"
    )
    return Catalog(spark, root).pipeline_health(now=_HEALTH_REF)


PIPELINE_HEALTH_SQL = f"""
WITH {_RUNS_CTE}
SELECT pipeline,
       COUNT(*) AS total_runs,
       CAST(SUM(ok) AS BIGINT) AS total_successes,
       CAST(COUNT(*) - SUM(ok) AS BIGINT) AS total_failures,
       CAST(SUM(CASE WHEN finished_at >= {_HEALTH_REF} - 604800.0
                     THEN ok ELSE 0 END) AS BIGINT)
         / NULLIF(CAST(SUM(CASE WHEN finished_at >= {_HEALTH_REF} - 604800.0
                               THEN 1 ELSE 0 END) AS BIGINT), 0)
         AS success_rate_7d,
       CAST(SUM(CASE WHEN finished_at >= {_HEALTH_REF} - 2592000.0
                     THEN ok ELSE 0 END) AS BIGINT)
         / NULLIF(CAST(SUM(CASE WHEN finished_at >= {_HEALTH_REF} - 2592000.0
                               THEN 1 ELSE 0 END) AS BIGINT), 0)
         AS success_rate_30d,
       CAST(SUM(CASE WHEN finished_at >= {_HEALTH_REF} - 2592000.0
                     THEN rows_written END) AS BIGINT) AS total_rows_30d,
       MAX(CASE WHEN ok = 1 THEN finished_at END) AS last_success_at,
       MAX(CASE WHEN ok = 0 THEN finished_at END) AS last_failure_at,
       MAX(finished_at) AS last_run_at
FROM runs GROUP BY pipeline
"""


#: declared freshness SLAs per priority-pipeline — mixed so both
#: breach outcomes appear; 'nightly-report' never ran (NULL + breach)
_SLA_HOURS = {
    "1-URGENT": 24.0,
    "2-HIGH": 200.0,
    "3-MEDIUM": 100000.0,
    "4-NOT SPECIFIED": 100000.0,
    "5-LOW": 100000.0,
    "nightly-report": 24.0,
}


def sla_status_pipelines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness SLA snapshot (reference meta_sla_status): real
    Catalog.sla_status over the derived runs table. hours_since_success
    values are exact integers by construction (all epochs are whole
    hours), so ROUND(x, 3) is the identity in both engines."""
    _prep(spark)
    from odibi_spark.catalog import Catalog

    root = tempfile.mkdtemp()
    _orders_as_runs(spark, sf_dir).write.mode("overwrite").parquet(
        f"{root}/meta_runs"
    )
    return Catalog(spark, root).sla_status(_SLA_HOURS, now=_HEALTH_REF)


_SLA_VALUES = ", ".join(
    f"('{p}', {h})" for p, h in _SLA_HOURS.items()
)
SLA_STATUS_SQL = f"""
WITH {_RUNS_CTE},
per AS (
  SELECT pipeline, MAX(CASE WHEN ok = 1 THEN finished_at END)
           AS last_success
  FROM runs GROUP BY pipeline
),
sla(pipeline, expected_every_hours) AS (VALUES {_SLA_VALUES})
SELECT s.pipeline, s.expected_every_hours,
       ROUND(({_HEALTH_REF} - p.last_success) / 3600.0, 3)
         AS hours_since_success,
       COALESCE(({_HEALTH_REF} - p.last_success) / 3600.0
                  > s.expected_every_hours, TRUE) AS breached
FROM sla s LEFT JOIN per p ON s.pipeline = p.pipeline
"""


QUERIES.update({
    "merge_upsert_customers": merge_upsert_customers,
    "pipeline_health_runs": pipeline_health_runs,
    "sla_status_pipelines": sla_status_pipelines,
})
ORACLES.update({
    "merge_upsert_customers": MERGE_UPSERT_SQL,
    "pipeline_health_runs": PIPELINE_HEALTH_SQL,
    "sla_status_pipelines": SLA_STATUS_SQL,
})


def multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF round-trip under the hash oracle (VERDICT r7 task 5):
    synthesize a valid multi-frame GIF89a per document (geometry,
    frame count, and per-frame delay all arithmetic in doc_id) inside
    mapInPandas, then walk it with the stdlib GIF parser — the oracle
    recomputes width/height/frames/duration from the same formulas.
    Payloads are built AND decoded executor-side; nothing binary
    crosses the driver."""
    _prep(spark)
    from odibi_spark.llm.multimodal import extract_video_features, synth_gif

    docs = read_table(spark, sf_dir, "documents", cpu_heavy=True).select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it):
        for pdf in it:
            ids = pdf["media_id"].tolist()
            payloads = [
                synth_gif(
                    8 + d % 16, 6 + d % 9,
                    [4 + d % 7] * (1 + d % 5),
                )
                for d in ids
            ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    gifs = docs.mapInPandas(synth, "media_id long, payload binary")
    return extract_video_features(gifs, "payload", "media_id").select(
        "media_id", "width", "height", "n_frames", "duration_s"
    )


MULTIMODAL_VIDEO_SQL = """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 16 AS INTEGER) AS width,
       CAST(6 + doc_id % 9 AS INTEGER) AS height,
       CAST(1 + doc_id % 5 AS INTEGER) AS n_frames,
       CAST((1 + doc_id % 5) * (4 + doc_id % 7) AS DOUBLE) / 100.0
         AS duration_s
FROM documents
"""

QUERIES.update({"multimodal_video_features": multimodal_video_features})
ORACLES.update({"multimodal_video_features": MULTIMODAL_VIDEO_SQL})


def image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (r12, VERDICT r11 task 5): every document
    keyed to an 18x16 grayscale image (g = doc_id % 200 picks the base
    pattern; non-canonical docs perturb ONE pixel by +128), encoded as
    a REAL 24-bpp BMP executor-side, pixel-decoded back, box-averaged
    to 9x8, dHashed (64-bit difference hash), then near-dup pairs by
    4x16-bit hamming banding + exact popcount verify (the SimHash
    banding, reused via dedup.hash64_near_pairs). Payloads are built
    AND decoded executor-side (the synth_wav convention); the oracle
    replays pixels -> box means -> bits -> bands -> pairs as pure
    integer SQL, so the whole decode+hash+band pipeline is hash-gated.
    Scale: one mapInPandas pass + the band-key equi-join — candidates,
    never all pairs."""
    _prep(spark)
    from odibi_spark.llm.dedup import hash64_near_pairs
    from odibi_spark.llm.multimodal import image_dhash, synth_bmp24

    docs = read_table(spark, sf_dir, "documents", cpu_heavy=True).select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it):
        import numpy as np

        x = np.arange(18, dtype=np.int64)[None, None, :]
        y = np.arange(16, dtype=np.int64)[None, :, None]
        for pdf in it:
            ids = pdf["media_id"].to_numpy(dtype=np.int64)
            # whole-batch grid synthesis (r13): same polynomial per
            # pixel as the former per-doc loops, broadcast over
            # (docs, y, x) — value-identical, ~100x fewer Python ops
            g = (ids % 200)[:, None, None]
            grids = (
                g * 37 + x * x * (g % 7 + 2) + y * y * (g % 11 + 3)
                + x * y * (g % 5 + 1)
            )
            pert = ids % 5 != 0
            grids[pert, (ids * 7)[pert] % 16, ids[pert] % 18] += 128
            grids %= 256
            payloads = [synth_bmp24(grids[i]) for i in range(len(ids))]
            yield pd.DataFrame(
                {"media_id": ids.tolist(), "payload": payloads}
            )

    bmps = docs.mapInPandas(synth, "media_id long, payload binary")
    # checkpoint the tiny (id, hash) frame: Python map stages don't
    # canonicalize for exchange reuse, so the banding self-join would
    # otherwise synthesize+decode+hash the payloads TWICE (measured
    # 5x end-to-end at sf0.1 on the audio twin)
    hashes = image_dhash(bmps, "payload", "media_id").localCheckpoint(
        eager=True
    )
    return hash64_near_pairs(hashes, "media_id", "dhash", max_hamming=4)


IMAGE_DHASH_SQL = """
WITH pix AS (
  SELECT doc_id, gx.x, gy.y,
         ((doc_id % 200) * 37
          + gx.x * gx.x * ((doc_id % 200) % 7 + 2)
          + gy.y * gy.y * ((doc_id % 200) % 11 + 3)
          + gx.x * gy.y * ((doc_id % 200) % 5 + 1)
          + (CASE WHEN doc_id % 5 <> 0 AND gx.x = doc_id % 18
                       AND gy.y = (doc_id * 7) % 16
                  THEN 128 ELSE 0 END)) % 256 AS v
  FROM documents
  CROSS JOIN (SELECT UNNEST(generate_series(0, 17)) AS x) gx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) gy
),
cells AS (
  SELECT doc_id, x // 2 AS cx, y // 2 AS cy, SUM(v) // 4 AS m
  FROM pix GROUP BY doc_id, x // 2, y // 2
),
diffs AS (
  SELECT doc_id, cy, cx, m,
         LEAD(m) OVER (PARTITION BY doc_id, cy ORDER BY cx) AS mn
  FROM cells
),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN cx < 8 AND m < mn THEN
                    (CASE WHEN cy * 8 + cx = 63
                          THEN -9223372036854775808
                          ELSE (1::BIGINT << CAST(cy * 8 + cx AS INTEGER))
                     END)
                   ELSE 0 END) AS BIGINT) AS dhash
  FROM diffs GROUP BY doc_id
),
bands AS (
  SELECT doc_id, dhash, b.band,
         (dhash >> (16 * b.band)) & 65535 AS bh
  FROM h CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS band) b
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM bands a JOIN bands b USING (band, bh)
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.dhash, b.dhash)) <= 4
"""

QUERIES.update({"image_dhash_dedup": image_dhash_dedup})
ORACLES.update({"image_dhash_dedup": IMAGE_DHASH_SQL})


def audio_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio dedup (r12) — the audio twin of
    image_dhash_dedup: every document keyed to a synthetic tone
    pattern (g = doc_id % 200 picks the base; non-canonical docs
    perturb ONE sample by +4096), serialized as a REAL mono 16-bit
    PCM WAV executor-side, decoded back, energy-profile hashed into
    65 time buckets (ahash64), then near-dup pairs by 4x16-bit
    hamming banding + exact popcount verify. The oracle replays
    samples -> bucket means -> bits -> bands -> pairs as pure integer
    SQL. Scale: one mapInPandas pass + the band-key equi-join —
    candidates, never all pairs."""
    _prep(spark)
    from odibi_spark.llm.dedup import hash64_near_pairs
    from odibi_spark.llm.multimodal import audio_ahash, synth_wav_pcm16

    docs = read_table(spark, sf_dir, "documents", cpu_heavy=True).select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it):
        import numpy as np

        for pdf in it:
            ids = pdf["media_id"].tolist()
            payloads = []
            for d in ids:
                g = d % 200
                n = 1600 + (g % 7) * 64
                # vectorized sample synthesis (r13): same per-sample
                # polynomial as the former list comprehension
                i = np.arange(n, dtype=np.int64)
                samples = (
                    g * 131 + i * i * (g % 5 + 2) + i * (g % 13 + 7)
                ) % 2048
                if d % 5 != 0:
                    samples[(d * 11) % n] += 4096
                payloads.append(synth_wav_pcm16(samples))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    wavs = docs.mapInPandas(synth, "media_id long, payload binary")
    # checkpoint before the self-join — see image_dhash_dedup
    hashes = audio_ahash(wavs, "payload", "media_id").localCheckpoint(
        eager=True
    )
    return hash64_near_pairs(hashes, "media_id", "ahash", max_hamming=4)


AUDIO_AHASH_SQL = """
WITH par AS (
  SELECT doc_id, doc_id % 200 AS g,
         1600 + ((doc_id % 200) % 7) * 64 AS n
  FROM documents
),
smp AS (
  SELECT doc_id, n, r.i,
         (g * 131 + r.i * r.i * (g % 5 + 2) + r.i * (g % 13 + 7)) % 2048
         + CASE WHEN doc_id % 5 <> 0 AND r.i = (doc_id * 11) % n
                THEN 4096 ELSE 0 END AS v
  FROM par, LATERAL (SELECT unnest(range(0, n)) AS i) r
),
buck AS (
  SELECT doc_id, (i * 65) // n AS bkt, SUM(v) // COUNT(*) AS e
  FROM smp GROUP BY doc_id, (i * 65) // n
),
diffs AS (
  SELECT doc_id, bkt, e,
         LEAD(e) OVER (PARTITION BY doc_id ORDER BY bkt) AS en
  FROM buck
),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bkt < 64 AND e < en THEN
                    (CASE WHEN bkt = 63
                          THEN -9223372036854775808
                          ELSE (1::BIGINT << CAST(bkt AS INTEGER))
                     END)
                   ELSE 0 END) AS BIGINT) AS ahash
  FROM diffs GROUP BY doc_id
),
bands AS (
  SELECT doc_id, ahash, b.band,
         (ahash >> (16 * b.band)) & 65535 AS bh
  FROM h CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS band) b
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
FROM bands a JOIN bands b USING (band, bh)
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.ahash, b.ahash)) <= 4
"""

QUERIES.update({"audio_ahash_dedup": audio_ahash_dedup})
ORACLES.update({"audio_ahash_dedup": AUDIO_AHASH_SQL})


def video_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual video dedup (r12) — completes the image/audio/video
    trilogy: every document keyed to a short synthetic clip (g =
    doc_id % 200 picks the base pattern, 3 + g % 3 frames; a
    non-canonical doc perturbs ONE pixel of ONE frame by +128),
    serialized as a REAL uncompressed-DIB AVI executor-side, frame
    pixels decoded back, per-frame dHashed, then near-dup pairs by
    frame-hash SET Jaccard (>= 0.45 — a one-frame edit of a 3-frame
    clip scores (F-1)/(F+1) = 0.5). The oracle replays frames ->
    pixels -> cells -> bits -> sets -> Jaccard as pure integer SQL.
    Scale: one mapInPandas pass + the frame-hash equi-join —
    candidates, never all pairs."""
    _prep(spark)
    from odibi_spark.llm.multimodal import (
        synth_avi_dib, video_frame_dhashes, video_neardup_pairs,
    )

    docs = read_table(spark, sf_dir, "documents", cpu_heavy=True).select(
        F.col("doc_id").alias("media_id")
    )

    def synth(it):
        import numpy as np

        x = np.arange(18, dtype=np.int64)[None, None, :]
        y = np.arange(16, dtype=np.int64)[None, :, None]
        for pdf in it:
            ids = pdf["media_id"].tolist()
            payloads = []
            for d in ids:
                g = d % 200
                nf = 3 + g % 3
                # vectorized clip synthesis (r13): same per-pixel
                # polynomial, broadcast over (frame, y, x)
                f = np.arange(nf, dtype=np.int64)[:, None, None]
                frames = (
                    g * 37 + f * 53 + x * x * (g % 7 + 2)
                    + y * y * (g % 11 + 3) + x * y * (g % 5 + 1)
                )
                if d % 5 != 0:
                    frames[d % nf, (d * 7) % 16, d % 18] += 128
                frames %= 256
                payloads.append(
                    synth_avi_dib([frames[i] for i in range(nf)])
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    avis = docs.mapInPandas(synth, "media_id long, payload binary")
    # checkpoint before the set-overlap self-join — see image_dhash_dedup
    hashes = video_frame_dhashes(
        avis, "payload", "media_id"
    ).localCheckpoint(eager=True)
    return video_neardup_pairs(hashes, "media_id", "dhash", threshold=0.45)


VIDEO_DHASH_SQL = """
WITH par AS (
  SELECT doc_id, doc_id % 200 AS g,
         3 + (doc_id % 200) % 3 AS nf
  FROM documents
),
pix AS (
  SELECT doc_id, fr.f, gx.x, gy.y,
         (g * 37 + fr.f * 53
          + gx.x * gx.x * (g % 7 + 2)
          + gy.y * gy.y * (g % 11 + 3)
          + gx.x * gy.y * (g % 5 + 1)
          + (CASE WHEN doc_id % 5 <> 0 AND fr.f = doc_id % nf
                       AND gx.x = doc_id % 18 AND gy.y = (doc_id * 7) % 16
                  THEN 128 ELSE 0 END)) % 256 AS v
  FROM par
  , LATERAL (SELECT unnest(range(0, nf)) AS f) fr
  CROSS JOIN (SELECT UNNEST(generate_series(0, 17)) AS x) gx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) gy
),
cells AS (
  SELECT doc_id, f, x // 2 AS cx, y // 2 AS cy, SUM(v) // 4 AS m
  FROM pix GROUP BY doc_id, f, x // 2, y // 2
),
diffs AS (
  SELECT doc_id, f, cy, cx, m,
         LEAD(m) OVER (PARTITION BY doc_id, f, cy ORDER BY cx) AS mn
  FROM cells
),
h AS (
  SELECT doc_id, f,
         CAST(SUM(CASE WHEN cx < 8 AND m < mn THEN
                    (CASE WHEN cy * 8 + cx = 63
                          THEN -9223372036854775808
                          ELSE (1::BIGINT << CAST(cy * 8 + cx AS INTEGER))
                     END)
                   ELSE 0 END) AS BIGINT) AS dh
  FROM diffs GROUP BY doc_id, f
),
sets AS (SELECT DISTINCT doc_id, dh FROM h),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS s
  FROM sets a JOIN sets b USING (dh)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, s / (na.n + nb.n - s) AS jaccard
FROM shared
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE s / (na.n + nb.n - s) >= 0.45
"""

QUERIES.update({"video_dhash_dedup": video_dhash_dedup})
ORACLES.update({"video_dhash_dedup": VIDEO_DHASH_SQL})


def table_diff_orders_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-level table-version diff (§ beyond-reference:
    open-format twin of reference diagnostics/delta.py
    ``get_delta_diff``): snapshot A = yesterday's orders extract
    (every 13th key absent, every 5th key's total bumped — a stale
    price), snapshot B = today's (every 17th key absent). The diff
    classifies inserts/deletes/updates through ONE full-outer
    key-hashed join and rolls them up per order-year alongside each
    side's row counts — the "which partition moved" question answered
    without re-reading either snapshot wholesale."""
    _prep(spark)
    from odibi_spark.diagnostics import partition_diff

    orders = read_table(spark, sf_dir, "orders")
    snap_a = orders.filter("o_orderkey % 13 <> 0").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("price"),
    )
    snap_b = orders.filter("o_orderkey % 17 <> 0").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.col("o_totalprice").alias("price"),
    )
    return partition_diff(
        snap_a, snap_b, keys=["o_orderkey"],
        partition_expr="order_year", partition_alias="order_year",
        compare_cols=["price"],
    )


TABLE_DIFF_SQL = """
WITH a AS (
  SELECT o_orderkey, year(o_orderdate) AS order_year,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 13 <> 0
),
b AS (
  SELECT o_orderkey, year(o_orderdate) AS order_year,
         o_totalprice AS price
  FROM orders WHERE o_orderkey % 17 <> 0
),
ca AS (SELECT order_year, COUNT(*) AS rows_a FROM a GROUP BY order_year),
cb AS (SELECT order_year, COUNT(*) AS rows_b FROM b GROUP BY order_year),
ch AS (
  SELECT CASE WHEN b.o_orderkey IS NULL THEN a.order_year
              ELSE b.order_year END AS order_year,
         CASE WHEN a.o_orderkey IS NULL THEN 'insert'
              WHEN b.o_orderkey IS NULL THEN 'delete'
              WHEN a.price <> b.price THEN 'update'
              ELSE 'unchanged' END AS ct
  FROM b FULL OUTER JOIN a ON a.o_orderkey = b.o_orderkey
),
agg AS (
  SELECT order_year,
         SUM(CASE WHEN ct = 'insert' THEN 1 ELSE 0 END) AS inserts,
         SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END) AS deletes,
         SUM(CASE WHEN ct = 'update' THEN 1 ELSE 0 END) AS updates
  FROM ch GROUP BY order_year
)
SELECT CAST(order_year AS INTEGER) AS order_year,
       CAST(COALESCE(rows_a, 0) AS BIGINT) AS rows_a,
       CAST(COALESCE(rows_b, 0) AS BIGINT) AS rows_b,
       CAST(COALESCE(rows_b, 0) - COALESCE(rows_a, 0) AS BIGINT)
         AS rows_change,
       CAST(COALESCE(inserts, 0) AS BIGINT) AS inserts,
       CAST(COALESCE(deletes, 0) AS BIGINT) AS deletes,
       CAST(COALESCE(updates, 0) AS BIGINT) AS updates
FROM ca
FULL OUTER JOIN cb USING (order_year)
FULL OUTER JOIN agg USING (order_year)
ORDER BY order_year
"""

QUERIES.update(
    {"table_diff_orders_partitions": table_diff_orders_partitions}
)
ORACLES.update({"table_diff_orders_partitions": TABLE_DIFF_SQL})
