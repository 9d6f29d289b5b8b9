"""Benchmark harness: runs the headline workloads at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end: plan construction + execution to a
driver-side count/collect of the (small) result. Timings include JVM
warm-path effects in arrival order, so the heavy scans come first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # scan/agg/join heavy
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "q18_large_orders",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "agg_having_suppliers",
    "shipping_delay",
    # window / sessionization
    "window_running_revenue",
    "dedup_latest_order",
    "sessionize_events",
    # pivot / set ops
    "pivot_qty_by_status",
    "intersect_repeat_customers",
    # skew mitigation
    "skew_salted_event_join",
    # LLM-data ops
    "text_quality",
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "embedding_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from odibi_spark import get_spark
    from odibi_spark.workloads import QUERIES

    spark = get_spark("bench")
    # warm the JVM, parquet reader codepath, and OS page cache once so
    # the first measured query isn't charged for one-time startup
    spark.range(1).count()
    from odibi_spark.io import read_table

    for t in ("lineitem", "orders", "events", "documents"):
        read_table(spark, sf_dir, t).count()

    from pyspark.sql import functions as F

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # hash-reduce over every column: forces full evaluation of the
        # plan (a bare count() lets Catalyst prune unused projections,
        # e.g. window columns) while returning one row to the driver
        df.select(
            F.expr("bit_xor(xxhash64(struct(*)))").alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        timings[name] = round(time.time() - t0, 4)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
