"""Portable KMV distinct sketch (llm/kmv.py): determinism (pure
function of the value set), estimator error bounds, prefilter
transparency, and exact-below-k behavior."""

import math

import pytest
from pyspark.sql import Row, functions as F


def _vals(spark, n, group="g", dup=2):
    rows = [
        Row(g=group, v=f"{group}-value-{i % n}") for i in range(n * dup)
    ]
    return spark.createDataFrame(rows)


class TestKmvDistinct:
    def test_exact_below_k(self, spark):
        from odibi_spark.llm.kmv import kmv_distinct_by

        df = _vals(spark, 40)
        out = kmv_distinct_by(df, "g", "v", k=64).collect()
        assert len(out) == 1 and out[0].distinct_est == 40.0

    def test_estimator_error_bound(self, spark):
        """Relative error ~1/sqrt(k-2): at k=256 over 5000 distinct
        values, demand 4 sigma."""
        from odibi_spark.llm.kmv import kmv_distinct_by

        df = _vals(spark, 5000, dup=1)
        est = kmv_distinct_by(df, "g", "v", k=256).first().distinct_est
        sigma = 1.0 / math.sqrt(254)
        assert abs(est - 5000) / 5000 < 4 * sigma

    def test_prefilter_is_transparent(self, spark):
        """The scale prefilter may never change the sketch: same
        estimate with and without it, bit for bit."""
        from odibi_spark.llm.kmv import kmv_distinct_by

        df = _vals(spark, 3000, dup=1)
        with_f = kmv_distinct_by(df, "g", "v", k=128, prefilter=True)
        without = kmv_distinct_by(df, "g", "v", k=128, prefilter=False)
        assert with_f.first().distinct_est == without.first().distinct_est

    def test_partitioning_invariant(self, spark):
        """Unlike HLL/theta, the KMV estimate is a pure function of the
        value set — repartitioning cannot move it."""
        from odibi_spark.llm.kmv import kmv_distinct_by

        df = _vals(spark, 1000, dup=3)
        a = kmv_distinct_by(df.repartition(1), "g", "v", k=64)
        b = kmv_distinct_by(df.repartition(17), "g", "v", k=64)
        assert a.first().distinct_est == b.first().distinct_est

    def test_multi_group(self, spark):
        from odibi_spark.llm.kmv import kmv_distinct_by

        rows = [Row(g=f"g{i % 3}", v=f"{i % 3}:{i}") for i in range(900)]
        df = spark.createDataFrame(rows)
        out = {r.g: r.distinct_est for r in
               kmv_distinct_by(df, "g", "v", k=64).collect()}
        assert set(out) == {"g0", "g1", "g2"}
        for est in out.values():
            assert abs(est - 300) / 300 < 4 / math.sqrt(62)

    def test_forced_fallback_still_correct(self, spark):
        """margin=0-ish threshold abuse: even a degenerate margin keeps
        correctness via the validation fallback."""
        from odibi_spark.llm.kmv import kmv_distinct_by

        df = _vals(spark, 500, dup=1)
        out = kmv_distinct_by(df, "g", "v", k=64, margin=1)
        ref = kmv_distinct_by(df, "g", "v", k=64, prefilter=False)
        assert out.first().distinct_est == ref.first().distinct_est


class TestKmvBroadcastThresholdPath:
    def test_many_filtered_groups_with_numeric_group_col(self, spark):
        """>64 filtered groups route through the broadcast threshold
        table — with a NON-string group column (schema is inferred,
        not hardcoded) — and must match the unfiltered build exactly."""
        from odibi_spark.llm.kmv import kmv_distinct_by

        rows = [
            Row(g=gi, v=f"{gi}:{i}")
            for gi in range(70)
            for i in range(30)
        ]
        df = spark.createDataFrame(rows)
        filt = kmv_distinct_by(df, "g", "v", k=4, margin=1)
        ref = kmv_distinct_by(df, "g", "v", k=4, prefilter=False)
        assert sorted(map(tuple, filt.collect())) == sorted(
            map(tuple, ref.collect())
        )


class TestKmvOverlap:
    def _halves(self, spark, shared, only_a, only_b):
        a = spark.createDataFrame(
            [Row(v=f"s{i}") for i in range(shared)]
            + [Row(v=f"a{i}") for i in range(only_a)]
        )
        b = spark.createDataFrame(
            [Row(v=f"s{i}") for i in range(shared)]
            + [Row(v=f"b{i}") for i in range(only_b)]
        )
        return a, b

    def test_exact_below_k(self, spark):
        from odibi_spark.llm.kmv import kmv_overlap

        a, b = self._halves(spark, 20, 10, 15)
        r = kmv_overlap(a, b, col="v", k=256).first()
        assert r.distinct_a == 30.0 and r.distinct_b == 35.0
        assert r.union_est == 45.0
        assert abs(r.intersection_est - 20.0) < 1e-9
        assert abs(r.jaccard_est - 20.0 / 45.0) < 1e-12

    def test_estimates_within_bounds(self, spark):
        from odibi_spark.llm.kmv import kmv_overlap

        a, b = self._halves(spark, 2000, 1000, 1500)
        r = kmv_overlap(a, b, col="v", k=256).first()
        tol = 5 / math.sqrt(254)
        assert abs(r.distinct_a - 3000) / 3000 < tol
        assert abs(r.distinct_b - 3500) / 3500 < tol
        assert abs(r.union_est - 4500) / 4500 < tol
        # jaccard rho has binomial noise on top of the union est
        assert abs(r.jaccard_est - 2000 / 4500) < 0.15
        assert r.intersection_est <= min(r.distinct_a, r.distinct_b)

    def test_partitioning_invariant(self, spark):
        from odibi_spark.llm.kmv import kmv_overlap

        a, b = self._halves(spark, 800, 400, 600)
        r1 = kmv_overlap(
            a.repartition(1), b.repartition(1), col="v", k=128
        ).first()
        r2 = kmv_overlap(
            a.repartition(13), b.repartition(7), col="v", k=128
        ).first()
        assert (
            r1.distinct_a, r1.distinct_b, r1.union_est,
            r1.intersection_est, r1.jaccard_est,
        ) == (
            r2.distinct_a, r2.distinct_b, r2.union_est,
            r2.intersection_est, r2.jaccard_est,
        )

    def test_prefilter_is_transparent(self, spark):
        from odibi_spark.llm.kmv import kmv_overlap

        a, b = self._halves(spark, 1500, 700, 900)
        rf = kmv_overlap(a, b, col="v", k=128, prefilter=True).first()
        rn = kmv_overlap(a, b, col="v", k=128, prefilter=False).first()
        assert tuple(rf) == tuple(rn)

    def test_imbalanced_sides_fallback(self, spark):
        """Tiny side A vs big side B: the threshold comes from the
        SMALL side so A's sketch still fills; estimates stay exact for
        the small side."""
        from odibi_spark.llm.kmv import kmv_overlap

        a, b = self._halves(spark, 30, 5, 4000)
        r = kmv_overlap(a, b, col="v", k=64).first()
        assert r.distinct_a == 35.0  # small side exact (35 < k)
        assert abs(r.distinct_b - 4030) / 4030 < 5 / math.sqrt(62)


class TestKmvDuckdbParity:
    def test_bit_identical_vs_duckdb(self, spark):
        """The whole point: DuckDB rebuilds the sketch AND the estimate
        bit-for-bit from the same value set."""
        import duckdb

        from odibi_spark.llm.kmv import kmv_distinct_by

        rows = [Row(g="g0" if i % 3 else "g1", v=f"tok-{i % 700}")
                for i in range(2100)]
        df = spark.createDataFrame(rows)
        k = 64
        got = {r.g: r.distinct_est
               for r in kmv_distinct_by(df, "g", "v", k=k).collect()}
        con = duckdb.connect()
        con.register("t", df.toPandas())
        want = {
            r[0]: r[1]
            for r in con.execute(f"""
                WITH h AS (
                  SELECT DISTINCT g,
                    CAST(concat('0x', substring(md5(v),1,15)) AS BIGINT) AS h
                  FROM t
                ), r AS (
                  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) rn
                  FROM h
                )
                SELECT g,
                  CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                       ELSE (CAST({k - 1} AS DOUBLE) * 1152921504606846976)
                            / CAST(MAX(CASE WHEN rn = {k} THEN h END) AS DOUBLE)
                  END AS est
                FROM r WHERE rn <= {k} GROUP BY g
            """).fetchall()
        }
        assert got == want


class TestKmvNullGroupKeys:
    """ADVICE r10: NULL group keys must survive every dispatch path —
    routed through the unfiltered branch, never a None in sorted()."""

    def _mixed(self, spark, n_null=500, n_named=2000):
        rows = [Row(g=None, v=f"null-{i}") for i in range(n_null)] + [
            Row(g="big", v=f"big-{i}") for i in range(n_named)
        ]
        return spark.createDataFrame(rows, "g string, v string")

    def test_literal_path_keeps_null_group(self, spark):
        from odibi_spark.llm.kmv import kmv_distinct_by

        df = self._mixed(spark)
        out = {r[0]: r[1] for r in
               kmv_distinct_by(df, "g", "v", k=64, margin=1).collect()}
        ref = {r[0]: r[1] for r in
               kmv_distinct_by(df, "g", "v", k=64,
                               prefilter=False).collect()}
        assert None in out and out == ref

    def test_broadcast_path_keeps_null_group(self, spark):
        from odibi_spark.llm.kmv import kmv_distinct_by

        rows = [Row(g=None, v=f"null-{i}") for i in range(300)] + [
            Row(g=gi, v=f"{gi}:{i}")
            for gi in range(70)
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "g int, v string")
        out = kmv_distinct_by(df, "g", "v", k=4, margin=1)
        ref = kmv_distinct_by(df, "g", "v", k=4, prefilter=False)
        got = {r[0]: r[1] for r in out.collect()}
        want = {r[0]: r[1] for r in ref.collect()}
        assert None in got and got == want


class TestKmvDispatchPathsProperty:
    """VERDICT r10 task 7: drive the filtered-group count across the
    64-group literal<->broadcast seam for int/string/date keys and
    assert filtered == unfiltered by construction."""

    import datetime as _dt

    _KEYERS = {
        "int": lambda i: i,
        "string": lambda i: f"grp-{i:03d}",
        "date": lambda i: (
            TestKmvDispatchPathsProperty._dt.date(2024, 1, 1)
            + TestKmvDispatchPathsProperty._dt.timedelta(days=i)
        ),
    }

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        key_type=st.sampled_from(["int", "string", "date"]),
        n_groups=st.sampled_from([3, 63, 64, 65, 70]),
        per_group=st.integers(18, 40),
    )
    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture, HealthCheck.too_slow,
        ],
    )
    def test_filtered_equals_unfiltered(
        self, spark, key_type, n_groups, per_group
    ):
        from odibi_spark.llm.kmv import kmv_distinct_by

        keyer = self._KEYERS[key_type]
        rows = [
            Row(g=keyer(gi), v=f"{gi}:{i}")
            for gi in range(n_groups)
            for i in range(per_group)
        ]
        df = spark.createDataFrame(rows)
        # k=4, margin=1: per_group >= 18 > margin*k forces EVERY group
        # through the prefilter, so n_groups alone picks the path
        filt = kmv_distinct_by(df, "g", "v", k=4, margin=1)
        ref = kmv_distinct_by(df, "g", "v", k=4, prefilter=False)
        assert sorted(map(tuple, filt.collect())) == sorted(
            map(tuple, ref.collect())
        )
