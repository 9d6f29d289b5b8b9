"""Engine-contract utilities + phase detection tests."""

import datetime

import pytest
from pyspark.sql import Row

from odibi_spark.engine import (
    SchemaPolicyError,
    anonymize,
    content_hash,
    count_nulls,
    cross_check_row_counts,
    cross_check_schema_match,
    get_schema,
    harmonize_schema,
    skip_if_unchanged,
)
from odibi_spark.operators.manufacturing import detect_phases_frame


def ts(s):
    return datetime.datetime.fromisoformat(s)


class TestSchemaPolicy:
    def test_harmonize_casts_fills_orders(self, spark):
        df = spark.createDataFrame([Row(a=1, b="x", extra=True)])
        out = harmonize_schema(df, {"b": "string", "a": "bigint", "c": "double"})
        assert out.columns == ["b", "a", "c", "extra"]
        assert get_schema(out)["a"] == "bigint"
        assert out.collect()[0].c is None

    def test_enforce_modes(self, spark):
        df = spark.createDataFrame([Row(a=1, extra=True)])
        with pytest.raises(SchemaPolicyError, match="new columns"):
            harmonize_schema(df, {"a": "int"}, on_new_columns="fail")
        with pytest.raises(SchemaPolicyError, match="missing"):
            harmonize_schema(df, {"a": "int", "z": "int"}, on_missing_columns="fail")
        dropped = harmonize_schema(df, {"a": "int"}, on_new_columns="drop")
        assert dropped.columns == ["a"]


class TestAnonymize:
    def test_hash_mask_drop(self, spark):
        df = spark.createDataFrame([Row(id=1, email="a@x.com")])
        h = anonymize(df, ["email"], salt="s1").collect()[0].email
        h2 = anonymize(df, ["email"], salt="s2").collect()[0].email
        assert len(h) == 64 and h != h2  # salted
        assert anonymize(df, ["email"], method="mask").collect()[0].email == "***"
        assert anonymize(df, ["email"], method="drop").columns == ["id"]


class TestContentHash:
    def test_order_insensitive_and_sensitive_to_values(self, spark):
        a = spark.createDataFrame([Row(x=1, y="a"), Row(x=2, y="b")])
        b = spark.createDataFrame([Row(x=2, y="b"), Row(x=1, y="a")])
        c = spark.createDataFrame([Row(x=1, y="a"), Row(x=2, y="DIFF")])
        assert content_hash(a) == content_hash(b)
        assert content_hash(a) != content_hash(c)

    def test_skip_if_unchanged_pending_then_commit(self, spark, tmp_path):
        from odibi_spark.state import JsonStateBackend

        st = JsonStateBackend(str(tmp_path / "s.json"))
        df = spark.createDataFrame([Row(x=1)])
        skip, h = skip_if_unchanged(df, state=st, state_key="t")
        assert skip is False
        # NOT persisted until the caller commits (write succeeded)
        skip2, h2 = skip_if_unchanged(df, state=st, state_key="t")
        assert skip2 is False and h2 == h
        st.set("t", h)  # caller commits after successful write
        skip3, _ = skip_if_unchanged(df, state=st, state_key="t")
        assert skip3 is True
        df2 = spark.createDataFrame([Row(x=2)])
        skip4, h4 = skip_if_unchanged(df2, state=st, state_key="t")
        assert skip4 is False and h4 != h


class TestCrossCheck:
    def test_row_counts(self, spark):
        a = spark.range(100)
        b = spark.range(98)
        with pytest.raises(ValueError, match="row_count_diff"):
            cross_check_row_counts(a, b, max_rel_diff=0.01)
        cross_check_row_counts(a, b, max_rel_diff=0.05)

    def test_schema_match(self, spark):
        a = spark.createDataFrame([Row(x=1)])
        b = spark.createDataFrame([Row(x="s")])
        with pytest.raises(ValueError, match="schema mismatch"):
            cross_check_schema_match(a, b)


class TestNullProfile:
    def test_count_nulls_one_pass(self, spark):
        df = spark.createDataFrame(
            [Row(a=1, b=None), Row(a=None, b=None), Row(a=3, b="x")]
        )
        assert count_nulls(df) == {"a": 1, "b": 2}


class TestPhaseDetection:
    def test_phases_and_sequence_validation(self, spark):
        rows = []
        seq = [("heat", 3), ("mix", 2), ("cool", 2), ("heat", 1)]
        t = 0
        for status, n in seq:
            for _ in range(n):
                rows.append(Row(machine="m1", at=ts("2024-01-01 00:00:00")
                                + datetime.timedelta(minutes=10 * t), status=status))
                t += 1
        rows.append(Row(machine="m2", at=ts("2024-01-01 00:00:00"), status="heat"))
        df = spark.createDataFrame(rows)
        out = detect_phases_frame(
            df, group_by=["machine"], timestamp_col="at", status_col="status",
            expected_sequence=["heat", "mix", "cool"],
        )
        m1 = sorted(
            [r for r in out.collect() if r.machine == "m1"],
            key=lambda r: r.phase_index,
        )
        assert [(r.status, r.n_rows) for r in m1] == [
            ("heat", 3), ("mix", 2), ("cool", 2), ("heat", 1),
        ]
        assert m1[0].duration_minutes == 20.0  # 3 rows spanning 20 min
        assert [r.in_sequence for r in m1] == [True, True, True, True]
        # wrap-around: 4th phase expects 'heat' again (cycle repeat)
        m2 = [r for r in out.collect() if r.machine == "m2"]
        assert len(m2) == 1 and m2[0].n_rows == 1

    def test_out_of_sequence_flagged(self, spark):
        df = spark.createDataFrame(
            [
                Row(machine="m", at=ts("2024-01-01 00:00:00"), status="heat"),
                Row(machine="m", at=ts("2024-01-01 00:10:00"), status="cool"),  # skipped mix
            ]
        )
        out = detect_phases_frame(
            df, group_by=["machine"], timestamp_col="at", status_col="status",
            expected_sequence=["heat", "mix", "cool"],
        ).orderBy("phase_index")
        assert [r.in_sequence for r in out.collect()] == [True, False]
