"""Core relational workloads over the TPC-H-ish testdata tables.

Each query exercises named operators from SURVEY §2 (the operator each
entry proves is noted in its docstring). Spark side uses the operator
library; oracle side is DuckDB SQL over the same parquet views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.context import Context, EngineContext
from odibi_spark.workloads.common import read_table, untuned_session_prep
from odibi_spark.operators import advanced, relational, sql_core, window

# Scale 6 so 2-dp×2-dp×2-dp products (up to 6 decimal digits) are
# represented exactly — no rounding, hence no HALF_UP-vs-half-even
# divergence between Spark and the DuckDB oracle.
DEC = "DECIMAL(18,6)"


def _prep(spark: SparkSession) -> None:
    untuned_session_prep(spark)


def _ec(spark: SparkSession, df: DataFrame) -> EngineContext:
    return EngineContext(Context(spark), df)


def dsum(expr: str, alias: str) -> dict[str, str]:
    """Decimal-exact sum spec for the aggregate operator."""
    return {"alias": alias, "function": "sum", "column": f"CAST({expr} AS {DEC})"}


# ---------------------------------------------------------------- q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter + derive + aggregate (§2.3/§2.5).

    cpu_heavy: the per-row work is four DECIMAL(18,6) products + six
    wide decimal partial aggregates over a narrow scan — a warm
    alternating A/B at sf0.1 measured 0.62 s fanned vs 0.97 s on the
    3 input splits (r6; supersedes the r4 note taken before the
    decimal-exact rewrite made the map stage arithmetic-bound)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem", cpu_heavy=True))
    ec = sql_core.filter_rows(ec, condition="l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
    ec = sql_core.derive_columns(
        ec,
        columns={
            "disc_price": "l_extendedprice * (1 - l_discount)",
            "charge": "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
        },
    )
    ec = relational.aggregate(
        ec,
        group_by=["l_returnflag", "l_linestatus"],
        aggregations=[
            dsum("l_quantity", "sum_qty_d"),
            dsum("l_extendedprice", "sum_base_price_d"),
            dsum("disc_price", "sum_disc_price_d"),
            dsum("charge", "sum_charge_d"),
            dsum("l_discount", "sum_disc_d"),
            {"alias": "count_order", "function": "count", "column": "*"},
        ],
    )
    ec = sql_core.derive_columns(
        ec,
        columns={
            "sum_qty": "CAST(sum_qty_d AS DOUBLE)",
            "sum_base_price": "CAST(sum_base_price_d AS DOUBLE)",
            "sum_disc_price": "CAST(sum_disc_price_d AS DOUBLE)",
            "sum_charge": "CAST(sum_charge_d AS DOUBLE)",
            "avg_qty": "CAST(sum_qty_d AS DOUBLE) / count_order",
            "avg_price": "CAST(sum_base_price_d AS DOUBLE) / count_order",
            "avg_disc": "CAST(sum_disc_d AS DOUBLE) / count_order",
        },
    )
    ec = sql_core.select_columns(
        ec,
        columns=[
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
            "avg_disc", "count_order",
        ],
    )
    return ec.df


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS {DEC})) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- q3
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join chain + group + deterministic top-k (§2.4/§2.5).

    Scale note: the probe side is orders⋈lineitem; the broadcast hint
    goes on the FILTERED customer projection (segment filter + 1
    column), and is advisory (size-gated, see relational.py) — at
    100x scale the hint drops away and AQE picks the strategy.
    """
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    building = (
        cust.filter("c_mktsegment = 'BUILDING'")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    ec = _ec(spark, orders)
    ec = sql_core.filter_rows(ec, condition="o_orderdate < TIMESTAMP '1998-01-01 00:00:00'")
    ec = relational.join(ec, right=building, on=["o_custkey"], how="inner", broadcast=True)
    ec = relational.join(
        ec, right=li.withColumnRenamed("l_orderkey", "o_orderkey"),
        on=["o_orderkey"], how="inner",
    )
    ec = sql_core.filter_rows(ec, condition="l_shipdate > TIMESTAMP '1998-01-01 00:00:00'")
    ec = relational.aggregate(
        ec,
        group_by=["o_orderkey", "o_orderdate", "o_orderpriority"],
        aggregations=[dsum("l_extendedprice * (1 - l_discount)", "revenue_d")],
    )
    ec = sql_core.derive_columns(ec, columns={"revenue": "CAST(revenue_d AS DOUBLE)"})
    ec = sql_core.drop_columns(ec, columns=["revenue_d"])
    return ec.df.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


Q3_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------- q5
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 4-table join chain, broadcast dims, group (§2.4/§2.5)."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    ec = _ec(spark, li)
    ec = relational.join(
        ec, right=orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on=["l_orderkey"], how="inner",
    )
    ec = sql_core.filter_rows(
        ec,
        condition="o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'",
    )
    # customer grows with SF: no forced broadcast — AQE decides from
    # runtime sizes (locally it still picks broadcast; at 100 TB, SMJ)
    ec = relational.join(
        ec, right=cust.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"], how="inner",
    )
    ec = relational.join(
        ec, right=nation.withColumnRenamed("n_nationkey", "c_nationkey"),
        on=["c_nationkey"], how="inner", broadcast=True,
    )
    ec = relational.join(
        ec, right=region.withColumnRenamed("r_regionkey", "n_regionkey"),
        on=["n_regionkey"], how="inner", broadcast=True,
    )
    ec = sql_core.filter_rows(ec, condition="r_name = 'ASIA'")
    ec = relational.aggregate(
        ec, group_by=["n_name"],
        aggregations=[
            dsum("l_extendedprice * (1 - l_discount)", "revenue_d"),
            {"alias": "n_items", "function": "count", "column": "*"},
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"revenue": "CAST(revenue_d AS DOUBLE)"})
    return ec.df.select("n_name", "revenue", "n_items")


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------- q10
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue per customer, top 20 (§2.4/§2.5)."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    ec = _ec(spark, li)
    ec = sql_core.filter_rows(ec, condition="l_returnflag = 'R'")
    ec = relational.join(
        ec, right=orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on=["l_orderkey"], how="inner",
    )
    # customer is SF-linear: leave the join strategy to AQE
    ec = relational.join(
        ec, right=cust.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"], how="inner",
    )
    ec = relational.aggregate(
        ec, group_by=["o_custkey", "c_name"],
        aggregations=[dsum("l_extendedprice * (1 - l_discount)", "revenue_d")],
    )
    ec = sql_core.derive_columns(ec, columns={"revenue": "CAST(revenue_d AS DOUBLE)"})
    ec = sql_core.rename_columns(ec, mapping={"o_custkey": "c_custkey"})
    ec = sql_core.select_columns(ec, columns=["c_custkey", "c_name", "revenue"])
    return ec.df.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


Q10_SQL = f"""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ------------------------------------------------------- anti / semi
def anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (§2.4): customers with no high-value order."""
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    big = orders.filter("o_totalprice > 300000").withColumnRenamed("o_custkey", "c_custkey")
    ec = relational.join(_ec(spark, cust), right=big, on=["c_custkey"], how="anti")
    return ec.df.select("c_custkey", "c_name", "c_mktsegment")


ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


def semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (§2.4): customers with at least one urgent order."""
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter("o_orderpriority = '1-URGENT'").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    ec = relational.join(_ec(spark, cust), right=urgent, on=["c_custkey"], how="semi")
    return ec.df.select("c_custkey", "c_name")


SEMI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with coalesced key (§2.4)."""
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    c = cust.select(F.col("c_nationkey").alias("nationkey")).distinct().withColumn(
        "has_customer", F.lit(1)
    )
    s = supp.select(F.col("s_nationkey").alias("nationkey")).distinct().withColumn(
        "has_supplier", F.lit(1)
    )
    ec = relational.join(_ec(spark, c), right=s, on=["nationkey"], how="full")
    ec = sql_core.fill_nulls(ec, values={"has_customer": 0, "has_supplier": 0})
    return ec.df.select("nationkey", "has_customer", "has_supplier")


FULL_OUTER_SQL = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey, 1 AS has_customer FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey, 1 AS has_supplier FROM supplier)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(has_customer, 0) AS has_customer,
       COALESCE(has_supplier, 0) AS has_supplier
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


# ------------------------------------------------------ pivot family
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values — no distinct pre-scan (§2.5)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = relational.pivot(
        ec, group_by=["l_returnflag"], pivot_column="l_linestatus",
        value_column=f"CAST(l_quantity AS {DEC})", agg_function="sum", values=["O", "F"],
    )
    ec = sql_core.derive_columns(
        ec, columns={"O": "CAST(O AS DOUBLE)", "F": "CAST(F AS DOUBLE)"}
    )
    return ec.df


PIVOT_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS {DEC}) END) AS DOUBLE) AS "O",
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS {DEC}) END) AS DOUBLE) AS "F"
FROM lineitem
GROUP BY l_returnflag
"""


def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide metrics to long (§2.5)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = relational.aggregate(
        ec, group_by=["l_returnflag"],
        aggregations=[
            dsum("l_quantity", "sum_qty_d"),
            dsum("l_extendedprice", "sum_price_d"),
        ],
    )
    ec = sql_core.derive_columns(
        ec,
        columns={
            "sum_qty": "CAST(sum_qty_d AS DOUBLE)",
            "sum_price": "CAST(sum_price_d AS DOUBLE)",
        },
    )
    ec = sql_core.select_columns(ec, columns=["l_returnflag", "sum_qty", "sum_price"])
    ec = relational.unpivot(
        ec, id_columns=["l_returnflag"], value_columns=["sum_qty", "sum_price"],
        var_name="metric", value_name="value",
    )
    return ec.df


UNPIVOT_SQL = f"""
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM agg
"""


# ---------------------------------------------------------- windows
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal-exact sum per supplier (§2.6 window frames)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = window.window_calculation(
        ec, function="sum",
        column=f"CAST(l_extendedprice * (1 - l_discount) AS {DEC})",
        partition_by=["l_suppkey"],
        # the synthetic data has rows sharing (shipdate, orderkey,
        # linenumber); append value columns for a TOTAL order so the
        # running sum is deterministic (fully identical rows commute)
        order_by=["l_shipdate", "l_orderkey", "l_linenumber",
                  "l_quantity", "l_extendedprice", "l_discount"],
        output_column="running_d", frame="rows",
    )
    ec = sql_core.derive_columns(ec, columns={"running_revenue": "CAST(running_d AS DOUBLE)"})
    return ec.df.select("l_suppkey", "l_orderkey", "l_linenumber", "running_revenue")


WINDOW_RUNNING_SQL = f"""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber,
                           l_quantity, l_extendedprice, l_discount
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_revenue
FROM lineitem
"""


def window_price_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG per partition (§2.6)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = window.window_calculation(
        ec, function="lag", column="l_extendedprice",
        partition_by=["l_partkey"],
        order_by=["l_shipdate", "l_orderkey", "l_linenumber",
                  "l_quantity", "l_extendedprice", "l_discount"],
        output_column="prev_price",
    )
    ec = sql_core.derive_columns(
        ec, columns={"price_change": "l_extendedprice - prev_price"}
    )
    return ec.df.select("l_partkey", "l_orderkey", "l_linenumber", "price_change")


WINDOW_LAG_SQL = """
SELECT l_partkey, l_orderkey, l_linenumber,
       l_extendedprice - lag(l_extendedprice)
         OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber,
                        l_quantity, l_extendedprice, l_discount) AS price_change
FROM lineitem
"""


def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via row_number (§2.6)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "part"))
    ec = sql_core.row_number(
        ec, partition_by=["p_brand"], order_by=["p_retailprice", "p_partkey"],
        output_column="rk", descending=True,
    )
    ec = sql_core.filter_rows(ec, condition="rk <= 3")
    return ec.df.select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")


TOPK_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         CAST(row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey DESC) AS INTEGER) AS rk
  FROM part
) WHERE rk <= 3
"""


def dedup_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deduplicate operator: latest order per customer (§2.6)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "orders"))
    ec = window.deduplicate(
        ec, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"], descending=True
    )
    return ec.df


DEDUP_SQL = """
SELECT * FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization + per-session rollup (§2.6)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "events"))
    ec = window.sessionize(
        ec, partition_by=["user_id"], timestamp_column="ts", gap_minutes=30.0,
        tiebreak_columns=["event_id"],
    )
    ec = relational.aggregate(
        ec, group_by=["user_id", "session_id"],
        aggregations=[
            {"alias": "n_events", "function": "count", "column": "*"},
            {"alias": "session_start", "function": "min", "column": "ts"},
            {"alias": "session_end", "function": "max", "column": "ts"},
        ],
    )
    return ec.df


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         concat(concat(CAST(user_id AS VARCHAR), '-'),
                CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR))
         AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
"""


# ------------------------------------------------ scalar / row ops
def case_when_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case_when buckets + aggregate (§2.3)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "orders"))
    ec = sql_core.case_when(
        ec,
        conditions=[
            {"when": "o_orderpriority IN ('1-URGENT','2-HIGH')", "then": "'high'"},
            {"when": "o_orderpriority = '3-MEDIUM'", "then": "'medium'"},
        ],
        default="'low'", output_column="priority_bucket",
    )
    ec = relational.aggregate(
        ec, group_by=["priority_bucket"],
        aggregations=[
            {"alias": "n_orders", "function": "count", "column": "*"},
            dsum("o_totalprice", "total_d"),
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"total_price": "CAST(total_d AS DOUBLE)"})
    return ec.df.select("priority_bucket", "n_orders", "total_price")


CASE_WHEN_SQL = f"""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
            ELSE 'low' END AS priority_bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total_price
FROM orders GROUP BY 1
"""


def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_date_parts + aggregate (§2.3)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "orders"))
    ec = sql_core.extract_date_parts(ec, column="o_orderdate", parts=["year", "month"])
    ec = relational.aggregate(
        ec, group_by=["o_orderdate_year", "o_orderdate_month"],
        aggregations=[
            {"alias": "n_orders", "function": "count", "column": "*"},
            dsum("o_totalprice", "total_d"),
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"total_price": "CAST(total_d AS DOUBLE)"})
    return ec.df.select("o_orderdate_year", "o_orderdate_month", "n_orders", "total_price")


DATE_PARTS_SQL = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_orderdate_year,
       CAST(month(o_orderdate) AS INTEGER) AS o_orderdate_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total_price
FROM orders GROUP BY 1, 2
"""


def shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_diff + date_trunc + date_add (§2.3)."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    ec = _ec(spark, li)
    ec = relational.join(
        ec, right=orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on=["l_orderkey"], how="inner",
    )
    ec = sql_core.date_diff(
        ec, start_column="o_orderdate", end_column="l_shipdate",
        unit="day", output_column="delay_days",
    )
    ec = sql_core.date_trunc(ec, column="l_shipdate", unit="month", output_column="ship_month")
    ec = relational.aggregate(
        ec, group_by=["ship_month"],
        aggregations=[
            {"alias": "n_items", "function": "count", "column": "*"},
            {"alias": "sum_delay", "function": "sum", "column": "delay_days"},
        ],
    )
    ec = sql_core.derive_columns(
        ec, columns={"avg_delay_days": "CAST(sum_delay AS DOUBLE) / n_items"}
    )
    return ec.df.select("ship_month", "n_items", "avg_delay_days")


SHIPPING_DELAY_SQL = """
SELECT date_trunc('month', l_shipdate) AS ship_month,
       COUNT(*) AS n_items,
       CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE)
         / COUNT(*) AS avg_delay_days
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
"""


def string_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text + split_part + concat_columns (§2.3)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "customer"))
    ec = sql_core.derive_columns(ec, columns={"name_lower": "lower(trim(c_name))"})
    ec = sql_core.split_part(
        ec, column="c_name", delimiter="#", index=2, output_column="cust_num"
    )
    ec = sql_core.concat_columns(
        ec, columns=["c_mktsegment", "cust_num"], separator="-", output_column="label"
    )
    return ec.df.select("c_custkey", "name_lower", "cust_num", "label")


STRING_OPS_SQL = """
SELECT c_custkey,
       lower(trim(c_name)) AS name_lower,
       split_part(c_name, '#', 2) AS cust_num,
       concat_ws('-', c_mktsegment, split_part(c_name, '#', 2)) AS label
FROM customer
"""


def schema_polish_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bulk schema-shaping family under oracle coverage (§2.3):
    cast_columns (raw-SQL DECIMAL passthrough + back to double),
    rename_columns, add_prefix, add_suffix, normalize_column_names
    (camelCase -> snake), trim_whitespace — chained as a YAML pipeline
    would chain them."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "customer"))
    ec = sql_core.cast_columns(ec, columns={"c_acctbal": "DECIMAL(12,2)"})
    ec = sql_core.cast_columns(ec, columns={"c_acctbal": "double"})
    ec = sql_core.rename_columns(ec, mapping={"c_name": "customerName"})
    ec = sql_core.add_prefix(ec, prefix="dim_", columns=["c_mktsegment"])
    ec = sql_core.add_suffix(ec, suffix="_key", columns=["c_custkey"])
    ec = sql_core.normalize_column_names(ec, style="snake_case")
    ec = sql_core.trim_whitespace(ec, columns=["customer_name"])
    return ec.df.select(
        "c_custkey_key", "customer_name", "dim_c_mktsegment", "c_acctbal"
    )


SCHEMA_POLISH_SQL = """
SELECT c_custkey AS c_custkey_key,
       trim(c_name) AS customer_name,
       c_mktsegment AS dim_c_mktsegment,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal
FROM customer
"""


def convert_timezone_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert_timezone (§2.3) under oracle coverage with FIXED-OFFSET
    zones (+02:00 -> -03:00, net -5h): fixed offsets make the oracle
    independent of the DuckDB session timezone and tzdata version; DST
    zone behavior is pinned separately in pytest."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "orders"))
    ec = sql_core.convert_timezone(
        ec, column="o_orderdate", from_tz="+02:00", to_tz="-03:00",
        output_column="local_ts",
    )
    return ec.df.select("o_orderkey", "o_orderdate", "local_ts")


CONVERT_TZ_SQL = """
SELECT o_orderkey, o_orderdate,
       o_orderdate - INTERVAL 5 HOUR AS local_ts
FROM orders
"""


def surrogate_keys_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact key formulas: md5 surrogate + CONV numeric key (§2.7)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "nation"))
    ec = advanced.generate_surrogate_key(
        ec, columns=["n_nationkey", "n_name"], output_column="sk"
    )
    ec = advanced.generate_numeric_key(
        ec, columns=["n_nationkey", "n_name"], output_column="nk"
    )
    return ec.df.select("n_nationkey", "n_name", "sk", "nk")


SURROGATE_SQL = """
SELECT n_nationkey, n_name,
       md5(concat_ws('|', COALESCE(CAST(n_nationkey AS VARCHAR), ''),
                          COALESCE(n_name, ''))) AS sk,
       CAST(concat('0x', substring(
            md5(concat_ws('|', COALESCE(CAST(n_nationkey AS VARCHAR), ''),
                               COALESCE(n_name, ''))), 1, 15)) AS BIGINT) AS nk
FROM nation
"""


def segment_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dict_based_mapping with default (§2.7)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "customer"))
    ec = advanced.dict_based_mapping(
        ec, column="c_mktsegment",
        mapping={"BUILDING": "b2b", "AUTOMOBILE": "b2c"},
        output_column="tier", default="other",
    )
    return ec.df.select("c_custkey", "c_mktsegment", "tier")


MAPPING_SQL = """
SELECT c_custkey, c_mktsegment,
       CASE c_mktsegment WHEN 'BUILDING' THEN 'b2b'
                         WHEN 'AUTOMOBILE' THEN 'b2c'
                         ELSE 'other' END AS tier
FROM customer
"""


def fill_replace_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fill_nulls + replace_values (§2.3)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "customer"))
    ec = sql_core.derive_columns(
        ec, columns={"seg": "CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END"}
    )
    ec = sql_core.fill_nulls(ec, values={"seg": "UNKNOWN"})
    ec = sql_core.replace_values(ec, column="seg", mapping={"BUILDING": "B2B"})
    return ec.df.select("c_custkey", "seg")


FILL_REPLACE_SQL = """
SELECT c_custkey,
       CASE
         WHEN COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END,
                       'UNKNOWN') = 'BUILDING' THEN 'B2B'
         ELSE COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END,
                       'UNKNOWN')
       END AS seg
FROM customer
"""


def union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union-by-name with reordered columns + distinct (§2.4)."""
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    a = cust.filter("c_mktsegment = 'BUILDING'").select("c_custkey", "c_name", "c_mktsegment")
    b = cust.filter("c_mktsegment = 'MACHINERY'").select("c_mktsegment", "c_custkey", "c_name")
    ec = relational.union(_ec(spark, a), others=[b, a], by_name=True, distinct=True)
    return ec.df


UNION_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'
"""


def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — native Spark beyond reference (§2.5 gap)."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    out = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr(f"CAST(l_quantity AS {DEC})")).alias("sum_qty_d"),
        )
        .withColumn("sum_qty", F.col("sum_qty_d").cast("double"))
        .drop("sum_qty_d")
    )
    return out


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def explode_part_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(...)) word counts (§2.7 arrays)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "part"))
    ec = sql_core.derive_columns(ec, columns={"words": "split(p_name, ' ')"})
    ec = advanced.explode_list_column(ec, column="words", output_column="word")
    ec = relational.aggregate(
        ec, group_by=["word"],
        aggregations=[{"alias": "n_parts", "function": "count", "column": "*"}],
    )
    return ec.df


EXPLODE_SQL = """
SELECT word, COUNT(*) AS n_parts
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
GROUP BY word
"""


def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json + unpack + aggregate (§2.7 JSON)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "events"))
    ec = advanced.parse_json(ec, column="props", schema="k INT", output_column="p")
    ec = sql_core.derive_columns(ec, columns={"k": "p.k"})
    ec = relational.aggregate(
        ec, group_by=["k"],
        aggregations=[
            {"alias": "n_events", "function": "count", "column": "*"},
            dsum("value", "sum_value_d"),
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"sum_value": "CAST(sum_value_d AS DOUBLE)"})
    return ec.df.select("k", "n_events", "sum_value")


JSON_SQL = f"""
SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (§2.8): customers ordering in both 1995 and 1996."""
    _prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    y95 = orders.filter("year(o_orderdate) = 1995").select("o_custkey")
    y96 = orders.filter("year(o_orderdate) = 1996").select("o_custkey")
    ec = relational.intersect(_ec(spark, y95), other=y96)
    return ec.df


INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (§2.8): 1995 customers gone by 1996."""
    _prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    y95 = orders.filter("year(o_orderdate) = 1995").select("o_custkey")
    y96 = orders.filter("year(o_orderdate) = 1996").select("o_custkey")
    ec = relational.except_rows(_ec(spark, y95), other=y96)
    return ec.df


EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def agg_having_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate + HAVING (§2.5)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = relational.aggregate(
        ec, group_by=["l_suppkey"],
        aggregations=[
            dsum("l_quantity", "qty_d"),
            {"alias": "n_items", "function": "count", "column": "*"},
            {"alias": "n_orders", "function": "count_distinct", "column": "l_orderkey"},
        ],
        having="CAST(qty_d AS DOUBLE) > 1000",
    )
    ec = sql_core.derive_columns(ec, columns={"total_qty": "CAST(qty_d AS DOUBLE)"})
    return ec.df.select("l_suppkey", "total_qty", "n_items", "n_orders")


HAVING_SQL = f"""
SELECT l_suppkey,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_suppkey
HAVING CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) > 1000
"""


def distinct_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct on projection (§2.3)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "customer"))
    ec = sql_core.distinct(ec, columns=["c_mktsegment", "c_nationkey"])
    return ec.df


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


def date_dimension_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_dimension pattern output (§2.9): generated calendar."""
    _prep(spark)
    from odibi_spark.patterns.date_dimension import build_date_dimension

    out = build_date_dimension(
        spark, start_date="1995-01-01", end_date="1996-12-31", fiscal_start_month=7
    )
    # DATE -> TIMESTAMP for oracle dtype parity (pandas renders DateType
    # as object but DuckDB DATE as datetime64)
    return out.withColumn("date", F.col("date").cast("timestamp"))


DATE_DIM_SQL = """
SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
       CAST(d AS TIMESTAMP) AS date,
       CAST(year(d) AS INTEGER) AS year,
       CAST(month(d) AS INTEGER) AS month,
       CAST(day(d) AS INTEGER) AS day,
       CAST(quarter(d) AS INTEGER) AS quarter,
       CAST(isodow(d) AS INTEGER) AS iso_weekday,
       CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS is_weekend,
       CAST(CASE WHEN month(d) >= 7 THEN year(d) + 1 ELSE year(d) END AS INTEGER) AS fiscal_year,
       CAST(((month(d) + 12 - 7) % 12) // 3 + 1 AS INTEGER) AS fiscal_quarter
FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1996-12-31',
                                    INTERVAL 1 DAY)) AS d)
"""


def cast_trim_clean_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 residue closure (VERDICT r5 noted cast/trim as tests-only):
    cast_columns + trim_whitespace + clean_text driven through the
    registry operators with a hash oracle — derive a padded string,
    trim it back, upper-case p_type, and cast price/size across types.
    Pure column expressions, zero shuffles."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "part"))
    ec = sql_core.derive_columns(
        ec, columns={"padded_name": "concat('  ', p_name, '  ')"}
    )
    ec = sql_core.trim_whitespace(ec, columns=["padded_name"])
    ec = sql_core.clean_text(ec, columns=["p_type"], trim=True, case="upper")
    ec = sql_core.cast_columns(
        ec,
        columns={"p_retailprice": "decimal(12,2)", "p_size": "string"},
    )
    return ec.df.select(
        "p_partkey", "padded_name",
        F.col("p_type").alias("type_upper"),
        F.col("p_retailprice").cast("double").alias("price2"),
        F.col("p_size").alias("size_str"),
    )


CAST_TRIM_SQL = """
SELECT p_partkey,
       trim(concat('  ', p_name, '  ')) AS padded_name,
       upper(trim(p_type)) AS type_upper,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price2,
       CAST(p_size AS VARCHAR) AS size_str
FROM part
"""

def sample_seeded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 `sample` operator under the hash oracle (VERDICT r6 task
    7): the registry transform's ``portable_key`` path — deterministic
    md5-fold Bernoulli selection keyed on doc_id, a pure function of
    (key, seed) so DuckDB recomputes the identical sample. (The
    engine-native ``df.sample`` path stays seeded-but-partition-
    dependent and can never hash-match another engine; documented in
    the operator docstring.) Pure filter expression, zero shuffles."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "documents"))
    ec = sql_core.sample(ec, fraction=0.3, seed=7, portable_key="doc_id")
    return ec.df.select("doc_id", "lang", "source")


SAMPLE_SEEDED_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE CAST(concat('0x', substring(
        md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 < 0.3
"""


def bloom_semijoin_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semijoin (beyond-reference runtime-filter
    operator, operators/runtime_filter.py): orders of BUILDING-segment
    customers via a ~2-byte/key bitmap Bloom probed JVM-side BEFORE
    the join's exchange, exact semijoin after — row-identical to plain
    WHERE EXISTS (the oracle), only the plan differs. Aggregated per
    priority with the decimal-sum discipline."""
    _prep(spark)
    from odibi_spark.operators.runtime_filter import bloom_semijoin_frames

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").filter(
        "c_mktsegment = 'BUILDING'"
    )
    semi = bloom_semijoin_frames(
        orders, cust, left_on="o_custkey", right_on="c_custkey", how="semi"
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


BLOOM_SEMIJOIN_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS sum_price
FROM orders
WHERE EXISTS (
  SELECT 1 FROM customer
  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "sample_seeded_docs": sample_seeded_docs,
    "bloom_semijoin_orders": bloom_semijoin_orders,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_revenue_by_nation": q5_revenue_by_nation,
    "q10_returned_revenue": q10_returned_revenue,
    "anti_inactive_customers": anti_inactive_customers,
    "semi_urgent_customers": semi_urgent_customers,
    "full_outer_nation_presence": full_outer_nation_presence,
    "pivot_qty_by_status": pivot_qty_by_status,
    "unpivot_flag_metrics": unpivot_flag_metrics,
    "window_running_revenue": window_running_revenue,
    "window_price_change": window_price_change,
    "topk_parts_per_brand": topk_parts_per_brand,
    "dedup_latest_order": dedup_latest_order,
    "sessionize_events": sessionize_events,
    "case_when_priority": case_when_priority,
    "date_parts_orders": date_parts_orders,
    "shipping_delay": shipping_delay,
    "string_ops_customers": string_ops_customers,
    "cast_trim_clean_parts": cast_trim_clean_parts,
    "schema_polish_customers": schema_polish_customers,
    "convert_timezone_orders": convert_timezone_orders,
    "surrogate_keys_nation": surrogate_keys_nation,
    "segment_mapping": segment_mapping,
    "fill_replace_segments": fill_replace_segments,
    "union_segments": union_segments,
    "cube_flag_status": cube_flag_status,
    "explode_part_words": explode_part_words,
    "json_event_props": json_event_props,
    "intersect_repeat_customers": intersect_repeat_customers,
    "except_lapsed_customers": except_lapsed_customers,
    "agg_having_suppliers": agg_having_suppliers,
    "distinct_segment_nation": distinct_segment_nation,
    "date_dimension_calendar": date_dimension_calendar,
}

ORACLES = {
    "sample_seeded_docs": SAMPLE_SEEDED_SQL,
    "bloom_semijoin_orders": BLOOM_SEMIJOIN_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_revenue_by_nation": Q5_SQL,
    "q10_returned_revenue": Q10_SQL,
    "anti_inactive_customers": ANTI_SQL,
    "semi_urgent_customers": SEMI_SQL,
    "full_outer_nation_presence": FULL_OUTER_SQL,
    "pivot_qty_by_status": PIVOT_SQL,
    "unpivot_flag_metrics": UNPIVOT_SQL,
    "window_running_revenue": WINDOW_RUNNING_SQL,
    "window_price_change": WINDOW_LAG_SQL,
    "topk_parts_per_brand": TOPK_SQL,
    "dedup_latest_order": DEDUP_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "case_when_priority": CASE_WHEN_SQL,
    "date_parts_orders": DATE_PARTS_SQL,
    "shipping_delay": SHIPPING_DELAY_SQL,
    "string_ops_customers": STRING_OPS_SQL,
    "cast_trim_clean_parts": CAST_TRIM_SQL,
    "schema_polish_customers": SCHEMA_POLISH_SQL,
    "convert_timezone_orders": CONVERT_TZ_SQL,
    "surrogate_keys_nation": SURROGATE_SQL,
    "segment_mapping": MAPPING_SQL,
    "fill_replace_segments": FILL_REPLACE_SQL,
    "union_segments": UNION_SQL,
    "cube_flag_status": CUBE_SQL,
    "explode_part_words": EXPLODE_SQL,
    "json_event_props": JSON_SQL,
    "intersect_repeat_customers": INTERSECT_SQL,
    "except_lapsed_customers": EXCEPT_SQL,
    "agg_having_suppliers": HAVING_SQL,
    "distinct_segment_nation": DISTINCT_SQL,
    "date_dimension_calendar": DATE_DIM_SQL,
}


# ------------------------------------------------ coverage batch 2

def split_events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_events_by_period day variant (§2.6): 26h synthetic
    intervals from events split at midnight boundaries."""
    _prep(spark)
    ev = read_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 26 HOURS")).alias("end_ts"),
    )
    ec = _ec(spark, iv)
    ec = window.split_events_by_period(
        ec, start_column="start_ts", end_column="end_ts", period="day"
    )
    return ec.df.select(
        "event_id", "period_start", "segment_start", "segment_end",
        F.round("duration_minutes", 6).alias("duration_minutes"),
    )


SPLIT_EVENTS_SQL = """
WITH iv AS (
  SELECT event_id, ts AS start_ts, ts + INTERVAL 26 HOURS AS end_ts FROM events
),
expl AS (
  SELECT event_id, start_ts, end_ts,
         unnest(generate_series(date_trunc('day', start_ts),
                                date_trunc('day', end_ts),
                                INTERVAL 1 DAY)) AS period_start
  FROM iv
)
SELECT event_id, period_start,
       greatest(start_ts, period_start) AS segment_start,
       least(end_ts, period_start + INTERVAL 1 DAY) AS segment_end,
       round((CAST(floor(epoch(least(end_ts, period_start + INTERVAL 1 DAY))) AS BIGINT)
              - CAST(floor(epoch(greatest(start_ts, period_start))) AS BIGINT)) / 60.0, 6)
         AS duration_minutes
FROM expl
WHERE (CAST(floor(epoch(least(end_ts, period_start + INTERVAL 1 DAY))) AS BIGINT)
       - CAST(floor(epoch(greatest(start_ts, period_start))) AS BIGINT)) / 60.0 > 0
"""


def lookup_nation_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """apply_mapping lookup join with default (§2.4 lookup)."""
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    ec = _ec(spark, cust)
    ec = relational.apply_mapping(
        ec, mapping_table=nation, key_column="c_nationkey",
        mapping_key="n_nationkey", mapping_value="n_name",
        output_column="nation_name", default="UNKNOWN",
    )
    return ec.df.select("c_custkey", "c_nationkey", "nation_name")


LOOKUP_SQL = """
SELECT c_custkey, c_nationkey, COALESCE(n_name, 'UNKNOWN') AS nation_name
FROM customer LEFT JOIN nation ON n_nationkey = c_nationkey
"""


def flag_order_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """validate_and_flag row-level rule flags (§2.10)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "orders"))
    ec = advanced.validate_and_flag(
        ec,
        rules={
            "price_pos": "o_totalprice > 1000",
            "known_status": "o_orderstatus IN ('O','F','P')",
        },
    )
    return ec.df.select("o_orderkey", "_issues")


FLAG_SQL = """
SELECT o_orderkey,
       concat_ws(';',
         CASE WHEN NOT (o_totalprice > 1000) THEN 'price_pos' END,
         CASE WHEN NOT (o_orderstatus IN ('O','F','P')) THEN 'known_status' END
       ) AS _issues
FROM orders
"""


def convert_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert_units affine conversion (§2.7): value degF -> degC."""
    _prep(spark)
    from odibi_spark.operators import units

    ec = _ec(spark, read_table(spark, sf_dir, "events"))
    ec = units.convert_units(
        ec, column="value", family="temperature", from_unit="F", to_unit="C",
        output_column="value_c",
    )
    return ec.df.select("event_id", "value", F.round("value_c", 6).alias("value_c"))


CONVERT_SQL = """
SELECT event_id, value,
       round(value * (5.0/9.0) + ((459.67 * 5.0/9.0) - 273.15), 6) AS value_c
FROM events
"""


def rollup_orders_year_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — native Spark beyond reference (§2.5 gap)."""
    _prep(spark)
    orders = read_table(spark, sf_dir, "orders")
    out = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr(f"CAST(o_totalprice AS {DEC})")).alias("tot_d"),
        )
        .withColumn("total_price", F.col("tot_d").cast("double"))
        .drop("tot_d")
    )
    return out


ROLLUP_SQL = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (1, 2)
"""


def window_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (§2.6 frame spec beyond reference): per
    customer, sum of orders within 10000 below the current price."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "orders"))
    ec = window.window_calculation(
        ec, function="sum", column=f"CAST(o_totalprice AS {DEC})",
        partition_by=["o_custkey"], order_by=["o_totalprice"],
        output_column="near_d", frame="range", frame_start=-10000, frame_end=0,
    )
    ec = sql_core.derive_columns(ec, columns={"nearby_spend": "CAST(near_d AS DOUBLE)"})
    return ec.df.select("o_orderkey", "o_custkey", "nearby_spend")


RANGE_FRAME_SQL = f"""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS {DEC})) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_spend
FROM orders
"""


QUERIES.update(
    {
        "split_events_by_day": split_events_by_day,
        "lookup_nation_names": lookup_nation_names,
        "flag_order_issues": flag_order_issues,
        "convert_event_values": convert_event_values,
        "rollup_orders_year_priority": rollup_orders_year_priority,
        "window_range_frame_spend": window_range_frame_spend,
    }
)
ORACLES.update(
    {
        "split_events_by_day": SPLIT_EVENTS_SQL,
        "lookup_nation_names": LOOKUP_SQL,
        "flag_order_issues": FLAG_SQL,
        "convert_event_values": CONVERT_SQL,
        "rollup_orders_year_priority": ROLLUP_SQL,
        "window_range_frame_spend": RANGE_FRAME_SQL,
    }
)
