"""TPC-H round 2: q4/q8/q9/q13/q15/q17/q19/q22 shapes adapted to the
driver's synthetic schema (no partsupp, no commit/receipt dates, no
c_phone — each adaptation is noted per query). Same hash-stable oracle
conventions as workloads/tpch.py: decimal-exact sums, identical aliases
both sides, deterministic tiebreaks on any LIMIT.

Plan intent at 100 TB is noted per query: bounded dims broadcast,
SF-linear joins left to AQE, correlated subqueries re-expressed as a
single window/agg pass instead of a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from odibi_spark.context import Context, EngineContext
from odibi_spark.workloads.common import read_table, untuned_session_prep
from odibi_spark.operators import relational, sql_core

DEC = "DECIMAL(18,6)"


def _prep(spark: SparkSession) -> None:
    untuned_session_prep(spark)


def _ec(spark: SparkSession, df: DataFrame) -> EngineContext:
    return EngineContext(Context(spark), df)


# ---------------------------------------------------------------- q4
# Adaptation: TPC-H Q4's l_commitdate < l_receiptdate becomes
# "shipped more than 30 days after the order date".
# Plan intent: the EXISTS is a LEFT SEMI join on the l_orderkey equi key
# with a residual non-equi condition — shuffles both sides on orderkey
# once, no broadcast of the SF-linear lineitem, no second scan.
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → semi join + priority counts (§2.4)."""
    _prep(spark)
    orders = read_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND "
        "o_orderdate < TIMESTAMP '1996-10-01 00:00:00'"
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 30 DAY")),
        "left_semi",
    )
    ec = _ec(spark, late)
    ec = relational.aggregate(
        ec,
        group_by=["o_orderpriority"],
        aggregations=[{"alias": "order_count", "function": "count", "column": "*"}],
    )
    return ec.df.orderBy("o_orderpriority")


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------- q8
# Plan intent: nation/region are bounded dims → broadcast; part is
# filtered to one p_type before the join (advisory broadcast, size-
# gated); supplier/orders/customer joins are SF-linear → AQE decides.
# The share is a conditional aggregate over one joined pass.
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 7-table join, national market share by year
    (§2.4/§2.5). Share of PROMO-part revenue to ASIA customers that is
    supplied by NATION_1."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter("p_type = 'PROMO'")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    orders = read_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
        "o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    )
    cust = read_table(spark, sf_dir, "customer")

    # customers restricted to the ASIA region via bounded-dim broadcast
    asia_nations = nation.join(
        F.broadcast(region.select(F.col("r_regionkey").alias("n_regionkey"))),
        "n_regionkey",
        "inner",
    ).select(F.col("n_nationkey").alias("c_nationkey"))
    cust_asia = cust.join(F.broadcast(asia_nations), "c_nationkey", "inner")

    supp_named = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        "s_nationkey",
        "inner",
    )

    ec = _ec(spark, li)
    ec = relational.join(
        ec,
        right=part.select(F.col("p_partkey").alias("l_partkey")),
        on=["l_partkey"], how="inner", broadcast=True,
    )
    ec = relational.join(
        ec,
        right=supp_named.select(F.col("s_suppkey").alias("l_suppkey"), "supp_nation"),
        on=["l_suppkey"], how="inner",
    )
    ec = relational.join(
        ec,
        right=orders.select(
            F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_orderdate"
        ),
        on=["l_orderkey"], how="inner",
    )
    ec = relational.join(
        ec,
        right=cust_asia.select(F.col("c_custkey").alias("o_custkey")),
        on=["o_custkey"], how="inner",
    )
    ec = sql_core.derive_columns(
        ec, columns={"o_year": "CAST(year(o_orderdate) AS INT)"}
    )
    ec = relational.aggregate(
        ec,
        group_by=["o_year"],
        aggregations=[
            {
                "alias": "nation_d",
                "function": "sum",
                "column": (
                    "CAST(CASE WHEN supp_nation = 'NATION_1' THEN "
                    f"l_extendedprice * (1 - l_discount) ELSE 0 END AS {DEC})"
                ),
            },
            {
                "alias": "total_d",
                "function": "sum",
                "column": f"CAST(l_extendedprice * (1 - l_discount) AS {DEC})",
            },
        ],
    )
    ec = sql_core.derive_columns(
        ec,
        columns={
            "mkt_share": (
                "ROUND(CAST(nation_d AS DOUBLE) / CAST(total_d AS DOUBLE), 6)"
            ),
            "total_revenue": "CAST(total_d AS DOUBLE)",
        },
    )
    return ec.df.select("o_year", "mkt_share", "total_revenue").orderBy("o_year")


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_1'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS {DEC})) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE), 6)
         AS mkt_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE)
         AS total_revenue
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n2.n_regionkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------- q9
# Adaptation: no partsupp → supply cost proxied as 60% of
# p_retailprice. Profit per supplier nation per order year for parts
# named like '%widget%'.
# Plan intent: part is name-filtered before the join (pushed-down LIKE,
# advisory broadcast); nation broadcast; supplier/orders AQE-decided.
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: multi-join + derived profit measure (§2.4/§2.5)."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter("p_name LIKE '%widget%'")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")

    ec = _ec(spark, li)
    ec = relational.join(
        ec,
        right=part.select(F.col("p_partkey").alias("l_partkey"), "p_retailprice"),
        on=["l_partkey"], how="inner", broadcast=True,
    )
    ec = relational.join(
        ec,
        right=supp.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"),
        on=["l_suppkey"], how="inner",
    )
    ec = relational.join(
        ec,
        right=nation.select(
            F.col("n_nationkey").alias("s_nationkey"),
            F.col("n_name").alias("nation"),
        ),
        on=["s_nationkey"], how="inner", broadcast=True,
    )
    ec = relational.join(
        ec,
        right=orders.select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
        ),
        on=["l_orderkey"], how="inner",
    )
    ec = sql_core.derive_columns(
        ec,
        columns={
            "o_year": "CAST(year(o_orderdate) AS INT)",
            "amount_d": (
                f"CAST(l_extendedprice * (1 - l_discount) AS {DEC}) - "
                f"CAST(0.6 * p_retailprice * l_quantity AS {DEC})"
            ),
        },
    )
    ec = relational.aggregate(
        ec,
        group_by=["nation", "o_year"],
        aggregations=[
            {"alias": "profit_d", "function": "sum", "column": "amount_d"},
            {"alias": "n_lines", "function": "count", "column": "*"},
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"profit": "CAST(profit_d AS DOUBLE)"})
    return ec.df.select("nation", "o_year", "profit", "n_lines").orderBy(
        "nation", F.desc("o_year")
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})
                - CAST(0.6 * p_retailprice * l_quantity AS {DEC})) AS DOUBLE) AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# ---------------------------------------------------------------- q13
# Plan intent: orders pre-filtered (predicate pushed to the scan) then
# ONE shuffle on custkey for the left join + first groupBy; the second
# groupBy is over at most |distinct order counts| rows — trivially
# small at any scale.
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join + double aggregation histogram
    (§2.4/§2.5). Orders-per-customer distribution excluding
    '4-NOT SPECIFIED' priority orders."""
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        "o_orderpriority <> '4-NOT SPECIFIED'"
    )
    ec = _ec(spark, cust)
    ec = relational.join(
        ec,
        right=orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"),
        on=["c_custkey"], how="left",
    )
    ec = relational.aggregate(
        ec,
        group_by=["c_custkey"],
        aggregations=[{"alias": "c_count", "function": "count", "column": "o_orderkey"}],
    )
    ec = relational.aggregate(
        ec,
        group_by=["c_count"],
        aggregations=[{"alias": "custdist", "function": "count", "column": "*"}],
    )
    return ec.df.orderBy(F.desc("custdist"), F.desc("c_count"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------- q15
# Plan intent: one lineitem scan → per-supplier agg; the global max is
# a 1-row aggregate broadcast back over the per-supplier revenue (no
# global window → no single-partition sort of an SF-linear frame; no
# second lineitem scan — the revenue agg is computed once and AQE
# reuses the exchange for the max branch).
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: agg, global max via broadcast scalar, join back
    (§2.5/§2.4). Revenue kept DECIMAL through the max-equality test."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
        "l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
    )
    ec = _ec(spark, li)
    ec = relational.aggregate(
        ec,
        group_by=["l_suppkey"],
        aggregations=[
            {
                "alias": "revenue_d",
                "function": "sum",
                "column": f"CAST(l_extendedprice * (1 - l_discount) AS {DEC})",
            }
        ],
    )
    rev = ec.df
    top = rev.agg(F.max("revenue_d").alias("max_d"))
    best = rev.join(F.broadcast(top), rev.revenue_d == top.max_d, "inner")
    supp = read_table(spark, sf_dir, "supplier")
    out = supp.join(
        best.select(F.col("l_suppkey").alias("s_suppkey"), "revenue_d"),
        "s_suppkey",
        "inner",
    )
    return out.select(
        "s_suppkey",
        "s_name",
        F.col("revenue_d").cast("double").alias("total_revenue"),
    ).orderBy("s_suppkey")


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS revenue_d
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(revenue_d AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE revenue_d = (SELECT MAX(revenue_d) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------- q17
# Adaptation: Q17's brand+container filter becomes brand + p_size < 10.
# The correlated per-part AVG(l_quantity) subquery is ONE window pass
# over the partkey shuffle (exact decimal mean: sum/count — FP-order
# independent so the 0.5*avg boundary can't flip between engines).
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated avg → window, boundary-exact
    (§2.6/§2.5)."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        "p_brand = 'Brand#1' AND p_size < 10"
    )
    ec = _ec(spark, li)
    ec = relational.join(
        ec,
        right=part.select(F.col("p_partkey").alias("l_partkey")),
        on=["l_partkey"], how="inner", broadcast=True,
    )
    w = Window.partitionBy("l_partkey")
    df = ec.df.withColumn(
        "avg_qty",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double")
        / F.count(F.lit(1)).over(w),
    )
    df = df.filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    return df.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 6
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q17_SQL = f"""
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0, 6)
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM (
  SELECT l_extendedprice, l_quantity,
         CAST(SUM(CAST(l_quantity AS {DEC})) OVER (PARTITION BY l_partkey) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#1' AND p_size < 10
) t
WHERE l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------- q19
# Adaptation: Q19's container/shipmode branches become brand+size+qty
# branches. Plan intent: part pre-filtered to the 3 brands (pushed
# down, advisory broadcast); the OR-residual evaluates post-join in one
# codegen stage — no union-of-three-scans.
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-bracket predicate revenue
    (§2.3/§2.4/§2.5)."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        "p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')"
    )
    ec = _ec(spark, li)
    ec = relational.join(
        ec,
        right=part.select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size"),
        on=["l_partkey"], how="inner", broadcast=True,
    )
    ec = sql_core.filter_rows(
        ec,
        condition=(
            "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15"
            " AND l_quantity >= 1 AND l_quantity <= 20) OR "
            "(p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30"
            " AND l_quantity >= 5 AND l_quantity <= 25) OR "
            "(p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50"
            " AND l_quantity >= 10 AND l_quantity <= 30)"
        ),
    )
    ec = relational.aggregate(
        ec,
        group_by=[],
        aggregations=[
            {
                "alias": "revenue_d",
                "function": "sum",
                "column": f"CAST(l_extendedprice * (1 - l_discount) AS {DEC})",
            },
            {"alias": "n_lines", "function": "count", "column": "*"},
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"revenue": "CAST(revenue_d AS DOUBLE)"})
    return ec.df.select("revenue", "n_lines")


Q19_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 5 AND l_quantity <= 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 10 AND l_quantity <= 30)
"""


# ---------------------------------------------------------------- q22
# Adaptation: no c_phone → "country code" is c_nationkey, and since
# every synthetic customer has at least one lifetime order, "no
# orders" becomes "no orders since 2000-01-01" (lapsed customers). The
# positive-balance average is an exact decimal-sum / count division so
# the threshold is bit-identical in both engines.
# Plan intent: 1-row scalar broadcast-crossed over customer; orders
# anti join shuffles on custkey (SF-linear, AQE-decided); final groupBy
# over 25 nations.
def q22_inactive_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS anti join
    (§2.4/§2.5)."""
    _prep(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'"
    )
    avg_bal = cust.filter("c_acctbal > 0").agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal), cust.c_acctbal > avg_bal.avg_bal, "inner")
    ec = _ec(spark, rich.drop("avg_bal"))
    ec = relational.join(
        ec,
        right=orders.select(F.col("o_custkey").alias("c_custkey")),
        on=["c_custkey"], how="anti",
    )
    ec = relational.aggregate(
        ec,
        group_by=["c_nationkey"],
        aggregations=[
            {"alias": "numcust", "function": "count", "column": "*"},
            {
                "alias": "totacctbal_d",
                "function": "sum",
                "column": f"CAST(c_acctbal AS {DEC})",
            },
        ],
    )
    ec = sql_core.derive_columns(
        ec, columns={"totacctbal": "CAST(totacctbal_d AS DOUBLE)"}
    )
    return ec.df.select("c_nationkey", "numcust", "totacctbal").orderBy("c_nationkey")


Q22_SQL = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_bracket_revenue": q19_bracket_revenue,
    "q22_inactive_balances": q22_inactive_balances,
}
ORACLES = {
    "q4_order_priority": Q4_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q19_bracket_revenue": Q19_SQL,
    "q22_inactive_balances": Q22_SQL,
}
