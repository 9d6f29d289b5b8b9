"""Unit tests per operator over small inline frames (reference test
strategy: SURVEY §5, tests/unit/test_standard_transforms.py model)."""

import pytest
from pyspark.sql import Row

import odibi_spark.operators  # noqa: F401 — registers ops
from odibi_spark.registry import get_registry

R = get_registry()


@pytest.fixture()
def people(spark, make_ec):
    df = spark.createDataFrame(
        [
            Row(id=1, name="  Alice ", cat="A", v=10.0, n=None),
            Row(id=2, name="bob", cat="B", v=20.0, n=5),
            Row(id=3, name="Carol", cat="A", v=30.0, n=7),
            Row(id=4, name=None, cat="B", v=40.0, n=None),
        ]
    )
    return make_ec(df)


def test_filter_rows(people):
    out = R.apply("filter_rows", people, {"condition": "v > 15"}).df
    assert out.count() == 3


def test_derive_and_cast(people):
    out = R.apply("derive_columns", people, {"columns": {"v2": "v * 2"}})
    out = R.apply("cast_columns", out, {"columns": {"v2": "int"}}).df
    assert dict(out.dtypes)["v2"] == "int"
    assert [r.v2 for r in out.orderBy("id").collect()] == [20, 40, 60, 80]


def test_clean_text_trim_case(people):
    out = R.apply(
        "clean_text", people, {"columns": ["name"], "trim": True, "case": "lower"}
    ).df
    assert [r.name for r in out.orderBy("id").collect()] == [
        "alice", "bob", "carol", None,
    ]


def test_fill_nulls_and_replace(people):
    out = R.apply("fill_nulls", people, {"values": {"n": 0}})
    out = R.apply("replace_values", out, {"column": "cat", "mapping": {"A": "X"}}).df
    rows = out.orderBy("id").collect()
    assert [r.n for r in rows] == [0, 5, 7, 0]
    assert [r.cat for r in rows] == ["X", "B", "X", "B"]


def test_normalize_column_names(spark, make_ec):
    df = spark.createDataFrame([Row(**{"Some Col": 1, "camelCase": 2, "a-b": 3})])
    out = R.apply("normalize_column_names", make_ec(df), {}).df
    assert set(out.columns) == {"some_col", "camel_case", "a_b"}


def test_sort_limit_offset(people):
    out = R.apply("sort", people, {"columns": ["v"], "ascending": False})
    out = R.apply("limit", out, {"n": 2, "offset": 1}).df
    assert [r.id for r in out.collect()] == [3, 2]


def test_distinct_columns(people):
    out = R.apply("distinct", people, {"columns": ["cat"]}).df
    assert sorted(r.cat for r in out.collect()) == ["A", "B"]


def test_case_when_default(people):
    out = R.apply(
        "case_when",
        people,
        {
            "conditions": [{"when": "v >= 30", "then": "'hi'"}],
            "default": "'lo'",
            "output_column": "bucket",
        },
    ).df
    assert [r.bucket for r in out.orderBy("id").collect()] == ["lo", "lo", "hi", "hi"]


def test_join_collision_prefix(spark, make_ec):
    left = spark.createDataFrame([Row(k=1, x="l1"), Row(k=2, x="l2")])
    right = spark.createDataFrame([Row(k=1, x="r1")])
    out = R.apply(
        "join", make_ec(left), {"right": right, "on": ["k"], "how": "left", "prefix": "r"}
    ).df
    assert set(out.columns) == {"k", "x", "r_x"}
    rows = {r.k: r for r in out.collect()}
    assert rows[1].r_x == "r1" and rows[2].r_x is None


def test_join_anti_semi(spark, make_ec):
    left = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    right = spark.createDataFrame([Row(k=2)])
    anti = R.apply("join", make_ec(left), {"right": right, "on": ["k"], "how": "anti"}).df
    semi = R.apply("join", make_ec(left), {"right": right, "on": ["k"], "how": "semi"}).df
    assert sorted(r.k for r in anti.collect()) == [1, 3]
    assert [r.k for r in semi.collect()] == [2]


def test_union_by_name_missing(spark, make_ec):
    a = spark.createDataFrame([Row(x=1, y="a")])
    b = spark.createDataFrame([Row(y="b")])
    out = R.apply(
        "union", make_ec(a), {"others": [b], "by_name": True, "allow_missing": True}
    ).df
    assert out.count() == 2
    assert {r.y: r.x for r in out.collect()} == {"a": 1, "b": None}


def test_aggregate_having(people):
    out = R.apply(
        "aggregate",
        people,
        {
            "group_by": ["cat"],
            "aggregations": {"total": {"function": "sum", "column": "v"}},
            "having": "total > 45",
        },
    ).df
    assert [(r.cat, r.total) for r in out.collect()] == [("B", 60.0)]


def test_pivot_values(people):
    out = R.apply(
        "pivot",
        people,
        {
            "group_by": ["cat"],
            "pivot_column": "id",
            "value_column": "v",
            "agg_function": "sum",
            "values": ["1", "2"],
        },
    ).df
    assert set(out.columns) == {"cat", "1", "2"}


def test_unpivot(spark, make_ec):
    df = spark.createDataFrame([Row(id=1, a=1.0, b=2.0)])
    out = R.apply(
        "unpivot",
        make_ec(df),
        {"id_columns": ["id"], "value_columns": ["a", "b"]},
    ).df
    assert sorted((r.variable, r.value) for r in out.collect()) == [
        ("a", 1.0), ("b", 2.0),
    ]


def test_deduplicate_deterministic(spark, make_ec):
    df = spark.createDataFrame(
        [Row(k=1, ts=1, v="old"), Row(k=1, ts=2, v="new"), Row(k=2, ts=1, v="x")]
    )
    out = R.apply(
        "deduplicate", make_ec(df), {"keys": ["k"], "order_by": ["ts"], "descending": True}
    ).df
    assert {r.k: r.v for r in out.collect()} == {1: "new", 2: "x"}


def test_surrogate_and_numeric_key_formula(spark, make_ec):
    """Key formulas must be stable (SURVEY §7.3): md5 of pipe-joined
    coalesced strings; numeric = first 15 hex chars base-10."""
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=None, b="y")])
    out = R.apply(
        "generate_surrogate_key", make_ec(df), {"columns": ["a", "b"], "output_column": "sk"}
    )
    out = R.apply(
        "generate_numeric_key", out, {"columns": ["a", "b"], "output_column": "nk"}
    ).df
    import hashlib

    rows = out.orderBy("b").collect()
    exp1 = hashlib.md5(b"1|x").hexdigest()
    exp2 = hashlib.md5(b"|y").hexdigest()  # null -> ''
    assert rows[0].sk == exp1 and rows[1].sk == exp2
    assert rows[0].nk == int(exp1[:15], 16)
    assert rows[1].nk == int(exp2[:15], 16)


def test_validate_and_flag(spark, make_ec):
    df = spark.createDataFrame([Row(v=5), Row(v=-1)])
    out = R.apply(
        "validate_and_flag",
        make_ec(df),
        {"rules": {"nonneg": "v >= 0", "small": "v < 100"}},
    ).df
    rows = sorted([r._issues for r in out.collect()])
    assert rows == ["", "nonneg"]


def test_flatten_struct(spark, make_ec):
    df = spark.sql("SELECT 1 AS id, named_struct('a', 1, 'b', named_struct('c', 2)) AS s")
    out = R.apply("flatten_struct", make_ec(df), {}).df
    assert set(out.columns) == {"id", "s_a", "s_b_c"}


def test_sessionize_gap(spark, make_ec):
    df = spark.sql(
        """SELECT * FROM VALUES
        (1, TIMESTAMP '2024-01-01 00:00:00'),
        (1, TIMESTAMP '2024-01-01 00:10:00'),
        (1, TIMESTAMP '2024-01-01 01:10:00'),
        (2, TIMESTAMP '2024-01-01 00:00:00') AS t(uid, ts)"""
    )
    out = R.apply(
        "sessionize",
        make_ec(df),
        {"partition_by": ["uid"], "timestamp_column": "ts", "gap_minutes": 30.0},
    ).df
    sessions = {r.session_id for r in out.collect()}
    assert sessions == {"1-1", "1-2", "2-1"}


def test_window_calculation_frame(spark, make_ec):
    df = spark.createDataFrame([Row(g=1, t=1, v=1.0), Row(g=1, t=2, v=2.0), Row(g=1, t=3, v=3.0)])
    out = R.apply(
        "window_calculation",
        make_ec(df),
        {
            "function": "sum", "column": "v", "partition_by": ["g"],
            "order_by": ["t"], "output_column": "run", "frame": "rows",
        },
    ).df
    assert [r.run for r in out.orderBy("t").collect()] == [1.0, 3.0, 6.0]


def test_engine_context_sql_df_token(spark, make_ec):
    df = spark.createDataFrame([Row(x=1), Row(x=2)])
    out = make_ec(df).sql("SELECT sum(x) AS s FROM df")
    assert out.df.collect()[0].s == 3


class TestGroupingSets:
    def test_grouping_sets_matches_union_of_groupbys(self, spark):
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.operators import relational

        df = spark.createDataFrame(
            [("A", "X", 1.0), ("A", "Y", 2.0), ("B", "X", 3.0)],
            ["f", "s", "v"],
        )
        ec = EngineContext(Context(spark), df)
        out = relational.grouping_sets(
            ec,
            sets=[["f"], ["s"], []],
            aggregations=[
                {"alias": "n", "function": "count", "column": "*"},
                {"alias": "sv", "function": "sum", "column": "v"},
            ],
        ).df
        rows = {(r.f, r.s): (r.n, r.sv) for r in out.collect()}
        assert rows[("A", None)] == (2, 3.0)
        assert rows[("B", None)] == (1, 3.0)
        assert rows[(None, "X")] == (2, 4.0)
        assert rows[(None, None)] == (3, 6.0)

    def test_grouping_sets_having(self, spark):
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.operators import relational

        df = spark.createDataFrame([("A", 1.0), ("A", 2.0), ("B", 3.0)], ["f", "v"])
        ec = EngineContext(Context(spark), df)
        out = relational.grouping_sets(
            ec,
            sets=[["f"], []],
            aggregations=[{"alias": "n", "function": "count", "column": "*"}],
            having="n > 1",
        ).df
        got = {(r.f, r.n) for r in out.collect()}
        assert got == {("A", 2), (None, 3)}


class TestResampleTimeseries:
    def _frame(self, spark):
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                # a: events in buckets 0 and 3 (600s grid) -> gaps at 1, 2
                "ts": pd.to_datetime(
                    ["2024-01-01 00:01", "2024-01-01 00:05",
                     "2024-01-01 00:31", "2024-01-01 02:00"]
                ).astype("datetime64[us]"),
                "v": [10.0, 20.0, 40.0, 7.0],
            }
        )
        return spark.createDataFrame(pdf)

    def test_ffill_grid_and_gaps(self, spark):
        from odibi_spark.operators.window import resample_frames

        out = resample_frames(
            self._frame(spark),
            group_by=["k"],
            timestamp_column="ts",
            interval_seconds=600,
            aggregations={"n": "count(*)", "avg_v": "avg(v)"},
            fill_columns=["avg_v"],
            fill="ffill",
        ).collect()
        a = sorted(
            [(r.bucket_ts.minute, r.n, r.is_gap, r.avg_v_ffill)
             for r in out if r.k == "a"]
        )
        # dense 600s grid over a's span: buckets :00 :10 :20 :30
        assert [x[0] for x in a] == [0, 10, 20, 30]
        assert [x[1] for x in a] == [2, None, None, 1]
        assert [x[2] for x in a] == [False, True, True, False]
        # ffill carries the :00 average (15.0) through the gap
        assert [x[3] for x in a] == [15.0, 15.0, 15.0, 40.0]
        # b: single bucket, no gaps
        b = [r for r in out if r.k == "b"]
        assert len(b) == 1 and b[0].is_gap is False

    def test_zero_fill_and_registry_surface(self, spark):
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.registry import get_registry
        import odibi_spark.operators  # noqa: F401 — registers transforms

        ec = EngineContext(Context(spark), self._frame(spark))
        out = get_registry().apply(
            "resample_timeseries",
            ec,
            {
                "group_by": ["k"],
                "timestamp_column": "ts",
                "interval_seconds": 600,
                "aggregations": {"n": "count(*)"},
                "fill_columns": ["n"],
                "fill": "zero",
            },
        ).df
        rows = {(r.k, r.bucket_ts.minute): r.n_filled for r in out.collect()}
        assert rows[("a", 10)] == 0 and rows[("a", 0)] == 2

    def test_linear_interpolation(self, spark):
        from odibi_spark.operators.window import resample_frames

        out = resample_frames(
            self._frame(spark),
            group_by=["k"],
            timestamp_column="ts",
            interval_seconds=600,
            aggregations={"n": "count(*)", "avg_v": "avg(v)"},
            fill_columns=["avg_v"],
            fill="linear",
        ).collect()
        a = {r.bucket_ts.minute: r.avg_v_interp for r in out if r.k == "a"}
        # anchors 15.0@:00 and 40.0@:30 -> thirds across the gap
        assert a[0] == 15.0
        assert abs(a[10] - (15.0 + 25.0 / 3)) < 1e-9
        assert abs(a[20] - (15.0 + 50.0 / 3)) < 1e-9
        assert a[30] == 40.0

    def test_bad_fill_raises(self, spark):
        import pytest as _pytest

        from odibi_spark.operators.window import resample_frames

        with _pytest.raises(ValueError, match="unsupported fill"):
            resample_frames(
                self._frame(spark), group_by=["k"], timestamp_column="ts",
                interval_seconds=600, aggregations={"n": "count(*)"},
                fill="bogus",
            )


class TestNtileWindow:
    def test_ntile_buckets(self, spark):
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.registry import get_registry
        import odibi_spark.operators  # noqa: F401

        df = spark.createDataFrame([(i, float(i)) for i in range(8)], ["k", "v"])
        out = get_registry().apply(
            "window_calculation",
            EngineContext(Context(spark), df),
            {"function": "ntile", "order_by": ["v"],
             "output_column": "quartile", "ntile_buckets": 4},
        ).df
        got = {r.k: r.quartile for r in out.collect()}
        assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4}


class TestFuzzyMatchJoin:
    def test_one_edit_complete_even_when_prefix_breaks(self, spark):
        from odibi_spark.operators.fuzzy import fuzzy_match_join

        left = spark.createDataFrame(
            [(1, "gamma"), (2, "delta")], ["lid", "name"]
        )
        # Xamma breaks the prefix anchor; the suffix anchor still
        # blocks it with gamma — distance-1 completeness
        right = spark.createDataFrame(
            [(10, "Xamma"), (20, "deltaq"), (30, "zzzzz")], ["rid", "cand"]
        )
        out = fuzzy_match_join(
            left, right, left_col="name", right_col="cand", max_distance=1
        )
        got = {(r.lid, r.rid, r.edit_distance) for r in out.collect()}
        assert got == {(1, 10, 1), (2, 20, 1)}

    def test_distance_zero_and_collision_suffix(self, spark):
        from odibi_spark.operators.fuzzy import fuzzy_match_join

        left = spark.createDataFrame([(1, "alpha")], ["id", "name"])
        right = spark.createDataFrame([(9, "Alpha ")], ["id", "name"])
        out = fuzzy_match_join(
            left, right, left_col="name", right_col="name", max_distance=0
        ).collect()
        # normalization (lower/trim) makes them identical
        assert len(out) == 1
        assert out[0].edit_distance == 0 and out[0].id_r == 9

    def test_negative_distance_rejected(self, spark):
        import pytest as _pytest

        from odibi_spark.operators.fuzzy import fuzzy_match_join

        df = spark.createDataFrame([(1, "a")], ["id", "n"])
        with _pytest.raises(ValueError, match="max_distance"):
            fuzzy_match_join(
                df, df, left_col="n", right_col="n", max_distance=-1
            )


class TestSpatialNearJoin:
    def _join(self, spark, left_pts, right_pts, radius_m, **kw):
        from odibi_spark.operators.spatial import grid_near_join

        l = spark.createDataFrame(left_pts, ["lid", "lat", "lng"])
        r = spark.createDataFrame(right_pts, ["rid", "lat", "lng"])
        return grid_near_join(
            l, r, left_lat="lat", left_lng="lng", right_lat="lat",
            right_lng="lng", radius_m=radius_m, **kw,
        )

    def test_antimeridian_pair_found(self, spark):
        out = self._join(
            spark,
            [(1, 10.0, 179.9)],
            [(2, 10.0, -179.9), (3, 10.0, 0.0)],
            100_000.0,
        ).collect()
        assert [(r.lid, r.rid) for r in out] == [(1, 2)]
        assert out[0].distance_m < 25_000

    def test_matches_brute_force(self, spark):
        import math as m

        pts_l = [(i, (i * 17 % 100) - 50.0, (i * 31 % 340) - 170.0)
                 for i in range(120)]
        pts_r = [(i, (i * 13 % 100) - 50.0, (i * 41 % 340) - 170.0)
                 for i in range(80)]

        def hav(a, b):
            la1, lo1, la2, lo2 = map(m.radians, [a[1], a[2], b[1], b[2]])
            x = (m.sin((la2 - la1) / 2) ** 2
                 + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
            return 2 * 6371000.0 * m.asin(m.sqrt(x))

        want = {
            (a[0], b[0]) for a in pts_l for b in pts_r
            if hav(a, b) <= 800_000.0
        }
        got = {
            (r.lid, r.rid)
            for r in self._join(spark, pts_l, pts_r, 800_000.0).collect()
        }
        assert got == want and len(want) > 0

    def test_out_of_band_latitude_raises(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        with pytest.raises((Py4JJavaError, PySparkException)):
            self._join(
                spark, [(1, 75.0, 0.0)], [(2, 10.0, 0.0)], 1000.0
            ).collect()

    def test_polar_cap_rejected(self, spark):
        with pytest.raises(ValueError, match="polar cap"):
            self._join(
                spark, [(1, 0.0, 0.0)], [(2, 0.0, 0.0)], 1000.0,
                max_abs_lat=89.999,
            )


class TestResampleGapFlagNullAggregates:
    def test_present_bucket_with_all_null_values_is_not_a_gap(self, spark):
        import pandas as pd

        from odibi_spark.operators.window import resample_frames

        pdf = pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:01", "2024-01-01 00:21"]
                ).astype("datetime64[us]"),
                "v": [None, 5.0],
            }
        )
        out = resample_frames(
            spark.createDataFrame(pdf),
            group_by=["k"], timestamp_column="ts", interval_seconds=600,
            aggregations={"avg_v": "avg(v)"},
        ).collect()
        by_min = {r.bucket_ts.minute: r for r in out}
        # bucket :00 has a row (v null): avg is null but it is NOT a gap
        assert by_min[0].is_gap is False and by_min[0].avg_v is None
        assert by_min[10].is_gap is True  # the real gap


def test_fuzzy_and_spatial_yaml_surface_resolve_dataset_names(spark):
    """The registered transforms must accept a dataset NAME for
    ``right`` (the YAML form), like every other join transform."""
    from odibi_spark.context import Context, EngineContext

    ctx = Context(spark)
    ctx.register(
        "dirty", spark.createDataFrame([(9, "alphx")], ["rid", "cand"])
    )
    ctx.register(
        "sites", spark.createDataFrame([(9, 10.0, 20.0)], ["sid", "la", "lo"])
    )
    left = spark.createDataFrame([(1, "alpha")], ["lid", "name"])
    out = R.apply(
        "fuzzy_match",
        EngineContext(ctx, left),
        {"right": "dirty", "left_column": "name", "right_column": "cand",
         "max_distance": 1, "anchor": 2},
    ).df
    assert [(r.lid, r.rid) for r in out.collect()] == [(1, 9)]

    pts = spark.createDataFrame([(1, 10.0, 20.001)], ["pid", "lat", "lng"])
    out2 = R.apply(
        "spatial_near_join",
        EngineContext(ctx, pts),
        {"right": "sites", "left_lat": "lat", "left_lng": "lng",
         "right_lat": "la", "right_lng": "lo", "radius_m": 1000.0},
    ).df
    assert [(r.pid, r.sid) for r in out2.collect()] == [(1, 9)]


class TestPortableSample:
    """sample operator's portable_key path (VERDICT r6 task 7):
    selection is a pure function of (key, seed) — identical across
    partitionings and seeds select different subsets; the engine-
    native path still honors its seed."""

    def test_partition_invariant_and_seeded(self, spark):
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.registry import get_registry

        reg = get_registry()
        df = spark.range(0, 2000).withColumnRenamed("id", "k")

        def run(frame, seed):
            ec = EngineContext(Context(spark), frame)
            out = reg.apply(
                "sample", ec,
                {"fraction": 0.25, "seed": seed, "portable_key": "k"},
            )
            return sorted(r.k for r in out.df.collect())

        a = run(df, 7)
        b = run(df.repartition(13), 7)  # different partitioning
        assert a == b and 300 < len(a) < 700  # ~500 expected
        c = run(df, 8)
        assert c != a  # seed participates in the hash

    def test_native_path_still_seeded(self, spark):
        from odibi_spark.context import Context, EngineContext
        from odibi_spark.registry import get_registry

        reg = get_registry()
        df = spark.range(0, 1000).withColumnRenamed("id", "k")
        ec = EngineContext(Context(spark), df)
        n1 = reg.apply("sample", ec, {"fraction": 0.5, "seed": 3}).df.count()
        n2 = reg.apply("sample", ec, {"fraction": 0.5, "seed": 3}).df.count()
        assert n1 == n2  # same seed, same partitioning => same draw
