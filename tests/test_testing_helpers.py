"""User-facing test helpers (r15; reference odibi/testing parity)."""

import os

import pytest
from pyspark.sql import functions as F

from odibi_spark.testing import (
    FrozenSource,
    assert_frame_equal,
    assert_frame_equal_distributed,
    assert_schema_equal,
    generate_sample_data,
    temp_directory,
)


class TestGenerateSampleData:
    def test_deterministic_across_partitionings(self, spark):
        a = generate_sample_data(spark, rows=100, seed=7)
        b = generate_sample_data(spark, rows=100, seed=7).repartition(13)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_seed_changes_data(self, spark):
        a = generate_sample_data(spark, rows=50, seed=1).collect()
        b = generate_sample_data(spark, rows=50, seed=2).collect()
        assert sorted(map(tuple, a)) != sorted(map(tuple, b))

    def test_all_supported_types(self, spark):
        df = generate_sample_data(
            spark, rows=5,
            schema={"i": "int", "f": "float", "s": "str", "d": "date",
                    "b": "bool"},
        )
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert types == {
            "i": "int", "f": "double", "s": "string", "d": "date",
            "b": "boolean",
        }
        assert df.count() == 5

    def test_unknown_type_rejected(self, spark):
        with pytest.raises(ValueError, match="unsupported"):
            generate_sample_data(spark, schema={"x": "decimal"})


class TestAssertions:
    def test_frame_equal_order_independent(self, spark):
        a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
        b = spark.createDataFrame([(2, "y"), (1, "x")], "id long, v string")
        assert_frame_equal(a, b)
        assert_frame_equal_distributed(a, b)

    def test_frame_equal_duplicate_first_column(self, spark):
        # the reference's first-column sort is order-dependent here;
        # the canonical full-row sort is not
        a = spark.createDataFrame([(1, "x"), (1, "y")], "id long, v string")
        b = spark.createDataFrame([(1, "y"), (1, "x")], "id long, v string")
        assert_frame_equal(a, b)

    def test_frame_differs_raises(self, spark):
        a = spark.createDataFrame([(1, "x")], "id long, v string")
        b = spark.createDataFrame([(1, "z")], "id long, v string")
        with pytest.raises(AssertionError):
            assert_frame_equal(a, b)
        with pytest.raises(AssertionError, match="only in"):
            assert_frame_equal_distributed(a, b)

    def test_atol_tolerance(self, spark):
        a = spark.createDataFrame([(1.0,)], "v double")
        b = spark.createDataFrame([(1.0 + 1e-9,)], "v double")
        with pytest.raises(AssertionError):
            assert_frame_equal(a, b)
        assert_frame_equal(a, b, atol=1e-8)

    def test_schema_type_mismatch(self, spark):
        a = spark.createDataFrame([(1,)], "v long")
        b = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(AssertionError, match="Type mismatch"):
            assert_schema_equal(a, b)
        assert_schema_equal(a, b, check_types=False)


class TestFrozenSource:
    def test_freeze_verify_read_roundtrip(self, spark, tmp_path):
        df = generate_sample_data(spark, rows=20, seed=3)
        src = FrozenSource(spark, str(tmp_path / "pool"))
        manifest = src.freeze(df)
        assert manifest["rows"] == 20 and manifest["status"] == "frozen"
        back = src.read()  # verifies hash first
        assert_frame_equal(df, back)

    def test_drifted_data_fails_loudly(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        src = FrozenSource(spark, str(tmp_path / "pool"))
        src.freeze(df)
        # tamper: append an extra file into the frozen data dir
        extra = spark.createDataFrame([(3, "c")], "id long, v string")
        extra.write.mode("append").parquet(str(tmp_path / "pool" / "data"))
        with pytest.raises(AssertionError, match="drifted"):
            src.verify()

    def test_refreeze_refused(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        src = FrozenSource(spark, str(tmp_path / "pool"))
        src.freeze(df)
        with pytest.raises(Exception):
            src.freeze(df)  # errorifexists: frozen means frozen


class TestTempDirectory:
    def test_cleanup(self):
        with temp_directory() as d:
            assert os.path.isdir(d)
            open(os.path.join(d, "x"), "w").write("1")
        assert not os.path.exists(d)
