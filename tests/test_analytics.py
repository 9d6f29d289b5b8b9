"""Funnel / cohort / outlier operator semantics (operators/analytics.py)."""

import pandas as pd
from pyspark.sql import functions as F
import pytest

from odibi_spark.operators.analytics import (
    cohort_retention_frames,
    funnel_counts,
    funnel_frames,
    zscore_outliers,
)


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["u", "ts", "t"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    return spark.createDataFrame(pdf)


class TestFunnel:
    def test_order_matters(self, spark):
        df = _events(
            spark,
            [
                # u1 completes view -> click in order
                (1, "2024-01-01 10:00", "view"),
                (1, "2024-01-01 11:00", "click"),
                # u2 clicked BEFORE viewing: click must not count
                (2, "2024-01-01 09:00", "click"),
                (2, "2024-01-01 10:00", "view"),
            ],
        )
        fr = funnel_frames(
            df, user_col="u", ts_col="ts", type_col="t",
            steps=["view", "click"],
        )
        rows = {r.u: r for r in fr.collect()}
        assert rows[1].step_2_click_ts is not None
        assert rows[2].step_2_click_ts is None

    def test_within_horizon(self, spark):
        df = _events(
            spark,
            [
                (1, "2024-01-01 10:00", "view"),
                (1, "2024-01-09 10:00", "click"),  # outside 7 days
                (2, "2024-01-01 10:00", "view"),
                (2, "2024-01-02 10:00", "click"),  # inside
            ],
        )
        out = funnel_counts(
            df, user_col="u", ts_col="ts", type_col="t",
            steps=["view", "click"], within="7 days",
        ).collect()
        by_step = {r.step: r for r in out}
        assert by_step["view"].n_users == 2
        assert by_step["click"].n_users == 1
        assert by_step["click"].conversion_from_first == 0.5

    def test_chain_uses_first_qualifying_time(self, spark):
        # the user's FIRST click is before the view; the later click
        # qualifies, and purchase must follow that qualifying click
        df = _events(
            spark,
            [
                (1, "2024-01-01 08:00", "click"),
                (1, "2024-01-01 10:00", "view"),
                (1, "2024-01-01 12:00", "click"),
                (1, "2024-01-01 11:00", "purchase"),  # before the click
            ],
        )
        fr = funnel_frames(
            df, user_col="u", ts_col="ts", type_col="t",
            steps=["view", "click", "purchase"],
        ).collect()[0]
        assert fr.step_2_click_ts.hour == 12
        assert fr.step_3_purchase_ts is None

    def test_min_steps_validated(self, spark):
        df = _events(spark, [(1, "2024-01-01", "view")])
        with pytest.raises(ValueError, match="at least 2"):
            funnel_frames(
                df, user_col="u", ts_col="ts", type_col="t", steps=["view"]
            )


class TestCohortRetention:
    def test_daily_matrix(self, spark):
        df = _events(
            spark,
            [
                (1, "2024-01-01 09:00", "x"),
                (1, "2024-01-03 09:00", "x"),
                (2, "2024-01-01 12:00", "x"),
                (3, "2024-01-02 12:00", "x"),
                (3, "2024-01-02 13:00", "x"),  # same day, counted once
            ],
        )
        out = cohort_retention_frames(
            df, user_col="u", ts_col="ts", period="day"
        )
        rows = {
            (r.cohort_period.day, r.period_index): r.n_active
            for r in out.collect()
        }
        assert rows[(1, 0)] == 2  # u1, u2 on their first day
        assert rows[(1, 2)] == 1  # u1 back two days later
        assert rows[(2, 0)] == 1  # u3's cohort, deduped within day

    def test_bad_period(self, spark):
        df = _events(spark, [(1, "2024-01-01", "x")])
        with pytest.raises(ValueError, match="unsupported period"):
            cohort_retention_frames(
                df, user_col="u", ts_col="ts", period="fortnight"
            )


class TestZscoreOutliers:
    def test_planted_outlier_flagged(self, spark):
        vals = [10.0] * 20 + [11.0] * 20 + [1000.0]
        df = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(vals)], ["g", "i", "v"]
        )
        out = zscore_outliers(
            df, group_by=["g"], value_col="v", threshold=3.0
        )
        flagged = [r.i for r in out.filter("is_outlier").collect()]
        assert flagged == [40]

    def test_degenerate_groups_not_flagged(self, spark):
        df = spark.createDataFrame(
            [("single", 1, 5.0), ("const", 1, 2.0), ("const", 2, 2.0)],
            ["g", "i", "v"],
        )
        out = zscore_outliers(df, group_by=["g"], value_col="v").collect()
        assert all(r.is_outlier is False for r in out)
        assert all(r.z_score is None for r in out)

    def test_registry_surface(self, spark):
        import odibi_spark.operators  # noqa: F401
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.registry import get_registry

        df = spark.createDataFrame(
            [("g", v) for v in [1.0, 1.1, 0.9, 50.0]], ["g", "v"]
        )
        out = get_registry().apply(
            "flag_outliers",
            EngineContext(Context(spark), df),
            {"group_by": ["g"], "value_column": "v", "threshold": 1.0},
        ).df
        assert out.filter("is_outlier").count() == 1


def test_product_analytics_example_yaml_runs(spark, tmp_path):
    """examples/product_analytics.yaml end-to-end (paths redirected):
    funnel -> cohorts -> outliers -> resample, all from configuration."""
    import pathlib

    from odibi_spark.plans.pipeline import Pipeline

    y = pathlib.Path("examples/product_analytics.yaml").read_text()
    y = y.replace("base_path: /tmp/odibi_analytics", f"base_path: {tmp_path}")
    results = Pipeline.from_yaml(y, spark).run()
    for node in (
        "funnel_summary", "daily_cohorts", "value_outliers",
        "resampled_series", "event_transitions", "events_zordered",
    ):
        assert results[node].status == "success", (node, results[node].error)
    funnel = spark.read.parquet(str(tmp_path / "funnel"))
    assert funnel.count() == 3
    assert {"step", "n_users", "conversion_from_first"} <= set(funnel.columns)
    resampled = spark.read.parquet(str(tmp_path / "resampled"))
    assert {"bucket_ts", "is_gap", "avg_value_ffill"} <= set(resampled.columns)
    transitions = spark.read.parquet(str(tmp_path / "transitions"))
    assert {"from_type", "to_type", "n_transitions", "p_transition"} <= set(
        transitions.columns
    )
    zp = spark.read.parquet(str(tmp_path / "events_z"))
    assert zp.count() == spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
    assert set(zp.columns) == {"event_id", "user_id", "value"}


class TestEwma:
    def test_recursion_matches_hand_computed(self, spark):
        from odibi_spark.operators.analytics import ewma_frames

        df = spark.createDataFrame(
            [(1, "2024-01-01 10:00", 10.0),
             (1, "2024-01-01 11:00", 20.0),
             (1, "2024-01-01 12:00", 50.0)],
            ["u", "ts_s", "v"],
        ).select("u", F.to_timestamp("ts_s").alias("ts"), "v")
        out = ewma_frames(
            df, group_by=["u"], ts_col="ts", value_col="v", alpha=0.5
        )
        got = sorted((r.ts.hour, r.ewma) for r in out.collect())
        # y1=10, y2=.5*20+.5*10=15, y3=.5*50+.5*15=32.5
        assert got == [(10, 10.0), (11, 15.0), (12, 32.5)]

    def test_alpha_validated(self, spark):
        from odibi_spark.operators.analytics import ewma_frames

        df = _events(spark, [(1, "2024-01-01", "a")])
        with pytest.raises(ValueError, match="alpha"):
            ewma_frames(
                df, group_by=["u"], ts_col="ts", value_col="u", alpha=1.5
            )


class TestTransitionMatrix:
    def test_counts_and_conditional_probabilities(self, spark):
        from odibi_spark.operators.analytics import transition_matrix_frames

        rows = [
            ("u1", 1, "view"), ("u1", 2, "click"), ("u1", 3, "view"),
            ("u1", 4, "click"), ("u2", 1, "view"), ("u2", 2, "purchase"),
        ]
        df = spark.createDataFrame(rows, ["u", "ts", "t"])
        out = {
            (r.from_type, r.to_type): (r.n_transitions, r.p_transition)
            for r in transition_matrix_frames(
                df, group_by=["u"], ts_col="ts", type_col="t",
                terminal_label="<end>",
            ).collect()
        }
        # view -> click x2, view -> purchase x1
        assert out[("view", "click")] == (2, 2 / 3)
        assert out[("view", "purchase")] == (1, 1 / 3)
        # click -> view x1, click -> <end> x1 (u1's last event)
        assert out[("click", "view")] == (1, 0.5)
        assert out[("click", "<end>")] == (1, 0.5)
        assert out[("purchase", "<end>")] == (1, 1.0)
        # probabilities are row-conditional: each from_type sums to 1
        from collections import defaultdict

        sums = defaultdict(float)
        for (f, _), (_, p) in out.items():
            sums[f] += p
        assert all(abs(s - 1.0) < 1e-12 for s in sums.values())

    def test_null_types_and_null_groups_survive(self, spark):
        """A NULL event type is a real matrix row (from and to), and a
        mid-sequence NULL next-type must NOT be mislabeled terminal."""
        from odibi_spark.operators.analytics import transition_matrix_frames

        rows = [("u1", 1, "a"), ("u1", 2, None), ("u1", 3, "b")]
        df = spark.createDataFrame(rows, "u STRING, ts INT, t STRING")
        out = {
            (r.from_type, r.to_type): r.n_transitions
            for r in transition_matrix_frames(
                df, group_by=["u"], ts_col="ts", type_col="t",
                terminal_label="<end>",
            ).collect()
        }
        assert out == {("a", None): 1, (None, "b"): 1, ("b", "<end>"): 1}

    def test_without_terminal_last_events_drop(self, spark):
        from odibi_spark.operators.analytics import transition_matrix_frames

        df = spark.createDataFrame(
            [("u1", 1, "a"), ("u1", 2, "b")], ["u", "ts", "t"]
        )
        got = transition_matrix_frames(
            df, group_by=["u"], ts_col="ts", type_col="t"
        ).collect()
        assert [(r.from_type, r.to_type, r.n_transitions) for r in got] == [
            ("a", "b", 1)
        ]


class TestEwmaScan:
    """ewma_scan: the JVM blocked-scaled-cumsum closed form must agree
    with the pandas recursion (ewma_frames) across alpha regimes —
    including series long enough to exercise multiple blocks and the
    4-lag carry truncation."""

    def _series(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        rows = []
        for g, n in (("a", 2500), ("b", 300), ("c", 1), ("d", 3)):
            for i in range(n):
                rows.append((g, i, float(rng.standard_normal() * 50)))
        return spark.createDataFrame(rows, ["grp", "ts", "v"])

    @pytest.mark.parametrize("alpha", [1.0 / 3.0, 0.001, 0.9])
    def test_matches_pandas_recursion(self, spark, alpha):
        from odibi_spark.operators.analytics import ewma_frames, ewma_scan

        df = self._series(spark)
        got = {
            (r.grp, r.ts): r.ewma
            for r in ewma_scan(
                df, group_by=["grp"], ts_col="ts", value_col="v",
                alpha=alpha,
            ).collect()
        }
        exp = {
            (r.grp, r.ts): r.ewma
            for r in ewma_frames(
                df, group_by=["grp"], ts_col="ts", value_col="v",
                alpha=alpha,
            ).collect()
        }
        assert got.keys() == exp.keys()
        for k, e in exp.items():
            assert got[k] == pytest.approx(e, rel=1e-9, abs=1e-9), (k, alpha)

    def test_null_group_key_rows_survive(self, spark):
        """ewma_scan must keep NULL-group rows like ewma_frames does
        (the carry join is null-safe)."""
        from odibi_spark.operators.analytics import ewma_scan

        df = spark.createDataFrame(
            [(None, 0, 4.0), (None, 1, 8.0), ("g", 0, 2.0)],
            "grp STRING, ts INT, v DOUBLE",
        )
        got = {
            (r.grp, r.ts): r.ewma
            for r in ewma_scan(
                df, group_by=["grp"], ts_col="ts", value_col="v",
                alpha=0.5,
            ).collect()
        }
        assert got[(None, 0)] == 4.0
        assert got[(None, 1)] == pytest.approx(6.0)
        assert got[("g", 0)] == 2.0

    def test_alpha_one_is_identity(self, spark):
        from odibi_spark.operators.analytics import ewma_scan

        df = spark.createDataFrame([("g", 0, 7.0), ("g", 1, 3.0)], ["grp", "ts", "v"])
        got = {r.ts: r.ewma for r in ewma_scan(
            df, group_by=["grp"], ts_col="ts", value_col="v", alpha=1.0
        ).collect()}
        assert got == {0: 7.0, 1: 3.0}

    def test_no_python_and_no_single_partition(self, spark):
        """The whole point: no Arrow/Python exec node anywhere, and
        every window keyed by the group — never a global window."""
        from odibi_spark.operators.analytics import ewma_scan

        df = spark.range(0, 10_000).selectExpr(
            "CAST(id % 50 AS STRING) AS grp", "id AS ts",
            "CAST(id % 97 AS DOUBLE) AS v"
        )
        out = ewma_scan(df, group_by=["grp"], ts_col="ts", value_col="v",
                        alpha=0.25)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "SinglePartition" not in plan


class TestEwmaTransformEngines:
    def test_registry_engines_agree(self, spark):
        import odibi_spark.operators  # noqa: F401
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.registry import get_registry

        df = spark.createDataFrame(
            [("g", i, float(i % 13)) for i in range(50)], ["u", "ts", "v"]
        )
        params = {
            "group_by": ["u"], "timestamp_column": "ts",
            "value_column": "v", "alpha": 0.25,
        }
        reg = get_registry()
        native = {
            (r.u, r.ts): r.ewma
            for r in reg.apply(
                "ewma", EngineContext(Context(spark), df), params
            ).df.collect()
        }
        pandas_ = {
            (r.u, r.ts): r.ewma
            for r in reg.apply(
                "ewma", EngineContext(Context(spark), df),
                {**params, "engine": "pandas"},
            ).df.collect()
        }
        assert native.keys() == pandas_.keys()
        for k in native:
            assert native[k] == pytest.approx(pandas_[k], rel=1e-9)
        with pytest.raises(ValueError, match="engine"):
            reg.apply(
                "ewma", EngineContext(Context(spark), df),
                {**params, "engine": "duck"},
            )


class TestMadOutliers:
    def test_robust_to_the_outlier_itself(self, spark):
        from odibi_spark.operators.analytics import (
            mad_outliers,
            zscore_outliers,
        )

        # one extreme value inflates stddev enough that plain z misses
        # a moderate outlier; MAD still flags both
        vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 30.0, 100000.0]
        df = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(vals)], ["g", "i", "v"]
        )
        mad_flagged = {
            r.i for r in mad_outliers(
                df, group_by=["g"], value_col="v"
            ).filter("is_outlier").collect()
        }
        z_flagged = {
            r.i for r in zscore_outliers(
                df, group_by=["g"], value_col="v"
            ).filter("is_outlier").collect()
        }
        assert {7, 8} <= mad_flagged
        assert 7 not in z_flagged  # masked by the 100000 inflating sigma

    def test_zero_mad_group_safe(self, spark):
        from odibi_spark.operators.analytics import mad_outliers

        df = spark.createDataFrame(
            [("g", v) for v in [5.0, 5.0, 5.0, 9.0]], ["g", "v"]
        )
        out = mad_outliers(df, group_by=["g"], value_col="v").collect()
        assert all(r.robust_z is None and r.is_outlier is False for r in out)


class TestOutlierNullGroups:
    def test_null_group_rows_kept_not_dropped(self, spark):
        from odibi_spark.operators.analytics import (
            mad_outliers,
            zscore_outliers,
        )

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0),
             (None, 5.0), (None, 6.0), (None, 7.0)],
            ["g", "v"],
        )
        for fn in (zscore_outliers, mad_outliers):
            out = fn(df, group_by=["g"], value_col="v")
            # a plain equi-join would silently drop the null-key rows
            assert out.count() == 6, fn.__name__
            assert out.filter("g IS NULL").count() == 3, fn.__name__


class TestEwmaScanNullGuard:
    def test_null_value_raises_loudly(self, spark):
        from odibi_spark.operators.analytics import ewma_scan

        df = spark.createDataFrame(
            [("g", 0, 1.0), ("g", 1, None)], "grp STRING, ts INT, v DOUBLE"
        )
        out = ewma_scan(df, group_by=["grp"], ts_col="ts", value_col="v",
                        alpha=0.5)
        with pytest.raises(Exception, match="ewma_scan: NULL"):
            out.collect()
