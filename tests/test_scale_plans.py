"""Physical-plan assertions: the scale properties SCALING.md claims.

These tests read `.explain()` output — they pin WHAT THE PLAN DOES,
not just result correctness.
"""

import pytest
from pyspark.sql import Row, functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanProperties:
    def test_q5_broadcasts_dims_and_pushes_filters(self, spark):
        from odibi_spark.workloads import QUERIES

        df = QUERIES["q5_revenue_by_nation"](spark, "/root/testdata/sf0.001")
        plan = plan_of(df)
        assert plan.count("BroadcastHashJoin") >= 3
        assert "SortMergeJoin" not in plan
        assert "PushedFilters" in plan

    def test_fact_lookup_is_broadcast(self, spark):
        from odibi_spark.patterns.fact import DimensionLookup, build_fact

        dim = spark.createDataFrame([Row(k=1, sk=10)])
        fact = spark.createDataFrame([Row(oid=1, k=1)])
        out, _ = build_fact(
            fact, grain=["oid"],
            lookups=[DimensionLookup(dimension=dim, fact_keys=["k"], dim_keys=["k"],
                                     surrogate_key="sk", output_col="fk")],
            validate_grain=False,
        )
        assert "BroadcastHashJoin" in plan_of(out)

    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        """Bucketing co-locates join keys: the sort-merge join on two
        tables bucketed by the key needs NO Exchange (SCALING.md §IO)."""
        # warehouse.dir is static conf — tables land in ./spark-warehouse
        # (gitignored) and are dropped in finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            spark.range(1000).selectExpr("id AS k", "id * 2 AS v").write.bucketBy(
                4, "k"
            ).sortBy("k").mode("overwrite").saveAsTable("bt_a")
            spark.range(1000).selectExpr("id AS k", "id * 3 AS w").write.bucketBy(
                4, "k"
            ).sortBy("k").mode("overwrite").saveAsTable("bt_b")
            joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
            plan = plan_of(joined)
            assert "Exchange" not in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS bt_a")
            spark.sql("DROP TABLE IF EXISTS bt_b")


class TestSaltedJoin:
    def test_salted_equals_plain_join(self, spark):
        from odibi_spark.operators.skew import salted_join_frames

        # hot key: 90% of left rows share k=0
        left = spark.range(1000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k", "id AS v"
        )
        right = spark.createDataFrame([Row(k=0, name="hot"), Row(k=15, name="x")])
        plain = left.join(right, "k").groupBy("name").count()
        salted = salted_join_frames(left, right, on=["k"], salt_buckets=4) \
            .groupBy("name").count()
        assert sorted(plain.collect()) == sorted(salted.collect())

    def test_salt_spreads_hot_key(self, spark):
        from odibi_spark.operators.skew import salted_join_frames

        left = spark.range(100).selectExpr("0 AS k", "id AS v")
        right = spark.createDataFrame([Row(k=0, name="hot")])
        out = salted_join_frames(left, right, on=["k"], salt_buckets=8)
        assert out.count() == 100  # no row loss/duplication from salting
