"""TPC-H classics (adapted to the driver's synthetic schema) + grouping
sets — canonical operator compositions with plan-shape intent noted per
query. Oracle parity follows the decimal-sum conventions in
workloads/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odibi_spark.context import Context, EngineContext
from odibi_spark.workloads.common import read_table, untuned_session_prep
from odibi_spark.operators import relational, sql_core

DEC = "DECIMAL(18,6)"


def _prep(spark: SparkSession) -> None:
    untuned_session_prep(spark)


def _ec(spark: SparkSession, df: DataFrame) -> EngineContext:
    return EngineContext(Context(spark), df)


# ---------------------------------------------------------------- q6
# Plan intent: single scan, every predicate pushed to parquet, partial
# agg map-side, one-row result — no join, no wide shuffle.
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive filter + scalar aggregate (§2.3/§2.5)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = sql_core.filter_rows(
        ec,
        condition=(
            "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP '1998-01-01 00:00:00' AND "
            "l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
    )
    ec = relational.aggregate(
        ec,
        group_by=[],
        aggregations=[
            {
                "alias": "revenue_d",
                "function": "sum",
                "column": f"CAST(l_extendedprice * l_discount AS {DEC})",
            },
            {"alias": "n_lines", "function": "count", "column": "*"},
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"revenue": "CAST(revenue_d AS DOUBLE)"})
    return ec.df.select("revenue", "n_lines")


Q6_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS {DEC})) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------- q14
# Plan intent: lineitem filter pushed down; conditional aggregation in
# one pass (no second scan for the promo numerator). part grows with
# SF, so its broadcast hint is advisory (size-gated) — locally it
# broadcasts, at 100x scale the hint drops and AQE decides.
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast join + conditional ratio agg (§2.4/§2.5)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = sql_core.filter_rows(
        ec,
        condition=(
            "l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"
        ),
    )
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    ec = relational.join(ec, right=part, on=["l_partkey"], how="inner", broadcast=True)
    ec = relational.aggregate(
        ec,
        group_by=[],
        aggregations=[
            {
                "alias": "promo_d",
                "function": "sum",
                "column": (
                    "CAST(CASE WHEN p_type = 'PROMO' THEN "
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
            "promo_revenue": (
                "ROUND(100.0 * CAST(promo_d AS DOUBLE) / CAST(total_d AS DOUBLE), 6)"
            ),
            "total_revenue": "CAST(total_d AS DOUBLE)",
        },
    )
    return ec.df.select("promo_revenue", "total_revenue")


Q14_SQL = f"""
SELECT ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
             THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS {DEC})) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE), 6)
         AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE)
         AS total_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


# ---------------------------------------------------------------- q18
# Plan intent: the HAVING-filtered aggregate shrinks lineitem to a
# small key set; that small side then drives the orders join (AQE turns
# it into a broadcast at runtime); customer is SF-linear, so its join
# strategy is left to AQE too (no forced broadcast).
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg + HAVING, join back, deterministic top-k
    (§2.5 HAVING / §2.4 / §2.3 sort+limit)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = relational.aggregate(
        ec,
        group_by=["l_orderkey"],
        aggregations=[
            {"alias": "sum_qty_d", "function": "sum", "column": f"CAST(l_quantity AS {DEC})"}
        ],
        having="sum_qty_d > 150",
    )
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    ec = relational.join(ec, right=orders, on=["l_orderkey"], how="inner")
    cust = read_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    ec = relational.join(ec, right=cust, on=["o_custkey"], how="inner")
    ec = sql_core.derive_columns(ec, columns={"sum_qty": "CAST(sum_qty_d AS DOUBLE)"})
    return (
        ec.df.select(
            "c_name", "o_custkey", F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate", "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = f"""
SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(big.sum_qty_d AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS {DEC})) AS sum_qty_d
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS {DEC})) > 150
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# ------------------------------------------------- grouping sets
def groupingsets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS operator (§2.5 beyond-reference): per-flag,
    per-status, and grand-total rows in one pass."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "lineitem"))
    ec = relational.grouping_sets(
        ec,
        sets=[["l_returnflag"], ["l_linestatus"], []],
        aggregations=[
            {"alias": "n", "function": "count", "column": "*"},
            {
                "alias": "qty_d",
                "function": "sum",
                "column": f"CAST(l_quantity AS {DEC})",
            },
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"sum_qty": "CAST(qty_d AS DOUBLE)"})
    return ec.df.select("l_returnflag", "l_linestatus", "n", "sum_qty")


GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# ------------------------------------------------- IVF ANN (scale path)
def ivf_ann_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN over the embeddings table — the
    bucketed scale path next to lsh_ann_neighbors. The workload uses
    deterministic seed centroids (iters=0: the nlist lowest-id vectors)
    so DuckDB can replicate the full pipeline; Lloyd refinement
    (iters>=1) remains the quality path and is covered by pytest."""
    _prep(spark)
    from odibi_spark.llm.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings", cpu_heavy=True)
    return ivf_topk(emb, "vec_id", "embedding", k=5, nlist=8, nprobe=2, iters=0)


IVF_ANN_SQL = """
WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cell, vec AS cvec
  FROM (SELECT id, vec FROM v ORDER BY id LIMIT 8)
),
csims AS (
  SELECT v.id, v.vec, c.cell, list_dot_product(v.vec, c.cvec) AS sim
  FROM v CROSS JOIN cent c
),
ranked AS (
  SELECT id, vec, cell,
         row_number() OVER (PARTITION BY id ORDER BY sim DESC, cell) AS rn
  FROM csims
),
assign AS (SELECT id, vec, cell FROM ranked WHERE rn = 1),
probes AS (SELECT id AS query_id, vec AS qv, cell FROM ranked WHERE rn <= 2),
scored AS (
  SELECT p.query_id, a.id AS nbr_id,
         round(list_dot_product(p.qv, a.vec)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(a.vec, a.vec))), 6) AS cosine
  FROM probes p JOIN assign a USING (cell)
  WHERE a.id <> p.query_id
)
SELECT query_id, nbr_id, cosine, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nbr_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


# ------------------------------------------------- exact median
def median_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sort-based median per group (§2.5 beyond-reference agg;
    matches DuckDB median bit-for-bit, unlike percentile_approx)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "customer"))
    ec = relational.aggregate(
        ec,
        group_by=["c_mktsegment"],
        aggregations=[
            {"alias": "median_bal", "function": "median", "column": "c_acctbal"},
            {"alias": "n", "function": "count", "column": "*"},
        ],
    )
    return ec.df


MEDIAN_SQL = """
SELECT c_mktsegment, MEDIAN(c_acctbal) AS median_bal, COUNT(*) AS n
FROM customer GROUP BY c_mktsegment
"""


# ------------------------------------------------- min-per-group (Q2 shape)
def cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-within-group then join back, expressed as
    one window pass (row_number over (brand, price, partkey)) instead
    of the aggregate + self-join — half the scans, same result (§2.6)."""
    _prep(spark)
    ec = _ec(spark, read_table(spark, sf_dir, "part"))
    ec = sql_core.row_number(
        ec,
        partition_by=["p_brand"],
        order_by=["p_retailprice", "p_partkey"],
        output_column="rn",
    )
    ec = sql_core.filter_rows(ec, condition="rn = 1")
    return ec.df.select("p_brand", "p_partkey", "p_name", "p_retailprice")


CHEAPEST_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice, p_partkey) AS rn
  FROM part
) t WHERE rn = 1
"""


# ---------------------------------------------------------------- q7
# Plan intent (100 TB): the nation-pair predicate is pushed THROUGH
# the dimension joins before any fact join — supplier and customer
# are pre-filtered to the 2 nations via broadcast of the 2-row nation
# slice, so the lineitem join probes a 2/25th-sized build side. The
# three SF-linear joins (supplier, orders, customer) carry no forced
# broadcast hint: AQE picks broadcast locally and SMJ at scale.
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-table multi-join, nation-pair volume by year
    (§2.4/§2.5). Supp/cust nation pair (NATION_1, NATION_2) both ways."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    pair = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))

    sn = _ec(spark, supp)
    sn = relational.join(
        sn,
        right=pair.select(
            F.col("n_nationkey").alias("s_nationkey"),
            F.col("n_name").alias("supp_nation"),
        ),
        on=["s_nationkey"], how="inner", broadcast=True,
    )
    cn = _ec(spark, cust)
    cn = relational.join(
        cn,
        right=pair.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("cust_nation"),
        ),
        on=["c_nationkey"], how="inner", broadcast=True,
    )

    ec = _ec(spark, li)
    ec = sql_core.filter_rows(
        ec,
        condition="l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
        "l_shipdate < TIMESTAMP '1998-01-01 00:00:00'",
    )
    ec = relational.join(
        ec,
        right=sn.df.select(
            F.col("s_suppkey").alias("l_suppkey"), "supp_nation"
        ),
        on=["l_suppkey"], how="inner",
    )
    ec = relational.join(
        ec, right=orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on=["l_orderkey"], how="inner",
    )
    ec = relational.join(
        ec,
        right=cn.df.select(F.col("c_custkey").alias("o_custkey"), "cust_nation"),
        on=["o_custkey"], how="inner",
    )
    ec = sql_core.filter_rows(
        ec,
        condition="(supp_nation = 'NATION_1' AND cust_nation = 'NATION_2') OR "
        "(supp_nation = 'NATION_2' AND cust_nation = 'NATION_1')",
    )
    ec = sql_core.derive_columns(
        ec, columns={"l_year": "CAST(year(l_shipdate) AS INT)"}
    )
    ec = relational.aggregate(
        ec, group_by=["supp_nation", "cust_nation", "l_year"],
        aggregations=[
            {
                "alias": "revenue_d",
                "function": "sum",
                "column": f"CAST(l_extendedprice * (1 - l_discount) AS {DEC})",
            },
        ],
    )
    ec = sql_core.derive_columns(ec, columns={"revenue": "CAST(revenue_d AS DOUBLE)"})
    return ec.df.select("supp_nation", "cust_nation", "l_year", "revenue").orderBy(
        "supp_nation", "cust_nation", "l_year"
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
         (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


QUERIES = {
    "median_acctbal_by_segment": median_acctbal_by_segment,
    "cheapest_part_per_brand": cheapest_part_per_brand,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_nation_volume": q7_nation_volume,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "groupingsets_flag_status": groupingsets_flag_status,
    "ivf_ann_neighbors": ivf_ann_neighbors,
}
ORACLES = {
    "median_acctbal_by_segment": MEDIAN_SQL,
    "cheapest_part_per_brand": CHEAPEST_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_nation_volume": Q7_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "groupingsets_flag_status": GROUPING_SETS_SQL,
    "ivf_ann_neighbors": IVF_ANN_SQL,
}
