"""Distributed global rank (operators/rank.py): output must be
byte-identical to the plain unpartitioned window, with NO
Exchange SinglePartition in the plan."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from odibi_spark.operators.rank import global_ranks

ALL_FUNCS = {
    "rn": {"function": "row_number"},
    "rk": {"function": "rank"},
    "drk": {"function": "dense_rank"},
    "pr": {"function": "percent_rank"},
    "cd": {"function": "cume_dist"},
    "nt": {"function": "ntile", "buckets": 7},
}


def _window_twin(df, order_by, descending=False):
    cols = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_by
    ]
    w = Window.orderBy(*cols)
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("rk", F.rank().over(w).cast("long"))
        .withColumn("drk", F.dense_rank().over(w).cast("long"))
        .withColumn("pr", F.percent_rank().over(w))
        .withColumn("cd", F.cume_dist().over(w))
        .withColumn("nt", F.ntile(7).over(w))
    )


def _rows(df, key_cols):
    return sorted(
        tuple(r) for r in df.select(*key_cols, *ALL_FUNCS).collect()
    )


@pytest.fixture(scope="module")
def ties_df(spark):
    # 211 rows, many ties in k (only 10 distinct), unique id tiebreak
    rows = [(i, i % 10, float(i % 13)) for i in range(211)]
    return spark.createDataFrame(rows, "id LONG, k INT, v DOUBLE").repartition(8)


class TestGlobalRanksEquivalence:
    def test_unique_key_all_functions(self, spark, ties_df):
        got = global_ranks(
            ties_df, order_by=["k", "id"], columns=dict(ALL_FUNCS)
        )
        want = _window_twin(ties_df, ["k", "id"])
        assert _rows(got, ["id"]) == _rows(want, ["id"])

    def test_tied_key_rank_family(self, spark, ties_df):
        """Ties on k span many rows; rank/dense_rank/percent_rank/
        cume_dist must agree with the global window exactly (tie groups
        never span range partitions)."""
        funcs = {k: v for k, v in ALL_FUNCS.items() if k not in ("rn", "nt")}
        got = global_ranks(ties_df, order_by=["k"], columns=dict(funcs))
        want = _window_twin(ties_df, ["k"])
        g = sorted(tuple(r) for r in got.select("id", *funcs).collect())
        w = sorted(tuple(r) for r in want.select("id", *funcs).collect())
        # row_number/ntile under ties are order-arbitrary; rank family
        # is deterministic — compare per-id
        assert g == w

    def test_descending(self, spark, ties_df):
        got = global_ranks(
            ties_df, order_by=["k", "id"], columns=dict(ALL_FUNCS),
            descending=True,
        )
        want = _window_twin(ties_df, ["k", "id"], descending=True)
        assert _rows(got, ["id"]) == _rows(want, ["id"])

    def test_single_row_and_empty(self, spark):
        one = spark.createDataFrame([(1, 2.0)], "id LONG, v DOUBLE")
        got = global_ranks(
            one, order_by=["v", "id"],
            columns={"pr": {"function": "percent_rank"},
                     "nt": {"function": "ntile", "buckets": 3},
                     "rn": {"function": "row_number"}},
        ).collect()
        assert got[0]["pr"] == 0.0 and got[0]["nt"] == 1 and got[0]["rn"] == 1
        empty = spark.createDataFrame([], "id LONG, v DOUBLE")
        assert (
            global_ranks(
                empty, order_by=["v", "id"],
                columns={"rn": {"function": "row_number"}},
            ).count()
            == 0
        )

    def test_attach_totals(self, spark, ties_df):
        got = global_ranks(
            ties_df, order_by=["k", "id"],
            columns={"rn": {"function": "row_number"}},
            attach_totals={"tot_v": "v"},
        )
        tot = got.select("tot_v").first()["tot_v"]
        want = ties_df.agg(F.sum("v")).first()[0]
        assert tot == pytest.approx(want)

    def test_ntile_matches_sql_bucket_sizes(self, spark):
        """N=11, k=3 -> sizes 4,4,3 (first N mod k buckets heavy)."""
        df = spark.createDataFrame([(i,) for i in range(11)], "id LONG")
        got = global_ranks(
            df, order_by=["id"], columns={"nt": {"function": "ntile", "buckets": 3}}
        )
        sizes = {
            r["nt"]: r["c"]
            for r in got.groupBy("nt").agg(F.count("*").alias("c")).collect()
        }
        assert sizes == {1: 4, 2: 4, 3: 3}

    def test_bad_function_raises(self, spark, ties_df):
        with pytest.raises(ValueError, match="unsupported"):
            global_ranks(
                ties_df, order_by=["id"], columns={"x": {"function": "sum"}}
            )


class TestGlobalRanksPlan:
    def test_no_single_partition(self, spark, ties_df):
        got = global_ranks(
            ties_df, order_by=["k", "id"], columns=dict(ALL_FUNCS)
        )
        plan = got._jdf.queryExecution().toString()
        assert "SinglePartition" not in plan

    def test_window_calculation_distributed_path(self, spark, make_ec, ties_df):
        import odibi_spark.operators  # noqa: F401
        from odibi_spark.registry import get_registry

        reg = get_registry()
        ec = reg.apply(
            "window_calculation", make_ec(ties_df),
            {"function": "ntile", "order_by": ["k", "id"],
             "output_column": "nt", "ntile_buckets": 7,
             "distributed": True},
        )
        plan = ec.df._jdf.queryExecution().toString()
        assert "SinglePartition" not in plan
        want = _window_twin(ties_df, ["k", "id"])
        assert sorted((r["id"], r["nt"]) for r in ec.df.collect()) == sorted(
            (r["id"], r["nt"]) for r in want.collect()
        )

    def test_window_calculation_distributed_guards(self, spark, make_ec, ties_df):
        import odibi_spark.operators  # noqa: F401
        from odibi_spark.registry import get_registry

        reg = get_registry()
        with pytest.raises(ValueError, match="rank-family"):
            reg.apply(
                "window_calculation", make_ec(ties_df),
                {"function": "sum", "column": "v", "order_by": ["id"],
                 "output_column": "s", "distributed": True},
            )
        with pytest.raises(ValueError, match="rank-family"):
            reg.apply(
                "window_calculation", make_ec(ties_df),
                {"function": "rank", "partition_by": ["k"],
                 "order_by": ["id"], "output_column": "r",
                 "distributed": True},
            )
