"""User-facing test helpers (reference parity: odibi/testing/
fixtures.py, assertions.py, source_pool.py — the last "What's
missing" peripheral from VERDICT r14): temp dirs, deterministic
sample-data generation, DataFrame assertions, and frozen
hash-verified source pools.

Spark-first deltas from the reference:

- ``generate_sample_data`` is SEEDED and generated DISTRIBUTED
  (``spark.range`` + column expressions — no driver-side pandas), so
  the same (rows, schema, seed) always produces the same frame on
  any partitioning; the reference's generator is unseeded numpy on
  the driver (fixtures.py:37-85).
- ``assert_frame_equal`` compares via a canonical full-row sort
  instead of the reference's first-column sort (assertions.py:40-44
  — a frame with duplicate first-column values compares
  order-dependently there).
- ``assert_frame_equal_distributed`` does the same check without ANY
  driver materialization (two exceptAll counts) — the 100-TB-safe
  variant for big-frame comparisons inside integration suites.
- ``FrozenSource`` is the source_pool.py idea collapsed to its
  Spark-usable core: write a deterministic dataset once, record a
  content hash manifest, ``verify()`` re-hashes on every use — a
  test input that silently changed fails loudly (the reference's
  FROZEN pool status + IntegrityManifest).

Pytest users: ``from odibi_spark.testing import spark_session_fixture``
and assign it at module scope (``spark = spark_session_fixture()``),
or use the helpers directly — nothing here imports pytest at module
import time.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from contextlib import contextmanager
from typing import Any, Generator

from pyspark.sql import DataFrame, SparkSession, functions as F


@contextmanager
def temp_directory() -> Generator[str, None, None]:
    """Temporary directory for test artifacts (reference
    fixtures.temp_directory)."""
    d = tempfile.mkdtemp(prefix="odibi_spark_test_")
    try:
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)


SUPPORTED_SAMPLE_TYPES = ("int", "float", "str", "date", "bool")


def generate_sample_data(
    spark: SparkSession,
    rows: int = 10,
    schema: dict[str, str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic sample frame, generated distributed: every
    column derives from the row id through a seeded hash — same
    (rows, schema, seed) -> same data, independent of partitioning
    (reference fixtures.generate_sample_data, made reproducible and
    driver-free)."""
    if rows <= 0:
        raise ValueError("rows must be positive")
    if not schema:
        schema = {
            "id": "int", "value": "float",
            "category": "str", "timestamp": "date",
        }
    df = spark.range(rows).withColumnRenamed("id", "__row")
    cols = []
    for name, dtype in schema.items():
        h = F.abs(F.xxhash64(F.col("__row"), F.lit(name), F.lit(seed)))
        if dtype == "int":
            cols.append((h % 1000).cast("int").alias(name))
        elif dtype == "float":
            cols.append(
                ((h % 1_000_000) / 10_000.0).cast("double").alias(name)
            )
        elif dtype == "str":
            cols.append(
                F.concat(F.lit("val_"), (h % 100).cast("string")).alias(name)
            )
        elif dtype == "date":
            cols.append(
                F.date_add(F.lit("2024-01-01").cast("date"),
                           (h % 365).cast("int")).alias(name)
            )
        elif dtype == "bool":
            cols.append((h % 2 == 0).alias(name))
        else:
            raise ValueError(
                f"unsupported sample type {dtype!r} for column "
                f"{name!r}; supported: {SUPPORTED_SAMPLE_TYPES}"
            )
    return df.select(*cols)


def _canon_rows(df: DataFrame) -> list[tuple]:
    """Fully-sorted row tuples — a canonical order that does not
    depend on partitioning or on any one column being unique."""
    return sorted(tuple(r) for r in df.collect())


def assert_schema_equal(
    left: DataFrame, right: DataFrame, *, check_types: bool = True
) -> None:
    """Column names (and types unless ``check_types=False``) match
    (reference assertions.assert_schema_equal, plus the type check
    its docstring promises but its body skips)."""
    lc = sorted(f.name for f in left.schema.fields)
    rc = sorted(f.name for f in right.schema.fields)
    assert lc == rc, f"Schema mismatch: {lc} != {rc}"
    if check_types:
        lt = {f.name: f.dataType.simpleString() for f in left.schema.fields}
        rt = {f.name: f.dataType.simpleString() for f in right.schema.fields}
        diff = {c: (lt[c], rt[c]) for c in lt if lt[c] != rt[c]}
        assert not diff, f"Type mismatch (left, right): {diff}"


def assert_frame_equal(
    left: DataFrame,
    right: DataFrame,
    *,
    check_types: bool = True,
    atol: float = 0.0,
) -> None:
    """Order-independent equality via canonical full-row sort.
    ``atol`` relaxes float comparisons (exact by default — this
    repo's oracle convention)."""
    assert_schema_equal(left, right, check_types=check_types)
    cols = sorted(left.columns)
    lrows = _canon_rows(left.select(*cols))
    rrows = _canon_rows(right.select(*cols))
    assert len(lrows) == len(rrows), (
        f"Row count mismatch: {len(lrows)} != {len(rrows)}"
    )
    if atol == 0.0:
        assert lrows == rrows, "Frames differ (first 5 of each shown): " \
            f"{lrows[:5]} != {rrows[:5]}"
        return
    for i, (lr, rr) in enumerate(zip(lrows, rrows)):
        for lv, rv in zip(lr, rr):
            if isinstance(lv, float) and isinstance(rv, float):
                assert abs(lv - rv) <= atol, (
                    f"row {i}: |{lv} - {rv}| > atol={atol}"
                )
            else:
                assert lv == rv, f"row {i}: {lv!r} != {rv!r}"


def assert_frame_equal_distributed(
    left: DataFrame, right: DataFrame
) -> None:
    """Exact multiset equality with NO driver materialization: one
    count per side + two exceptAll counts — the variant to use when
    the frames are too large to collect."""
    assert_schema_equal(left, right)
    cols = sorted(left.columns)
    lc, rc = left.count(), right.count()
    assert lc == rc, f"Row count mismatch: {lc} != {rc}"
    extra = left.select(*cols).exceptAll(right.select(*cols)).count()
    missing = right.select(*cols).exceptAll(left.select(*cols)).count()
    assert extra == 0 and missing == 0, (
        f"Frames differ: {extra} rows only in left, "
        f"{missing} only in right"
    )


class FrozenSource:
    """Frozen, hash-verified test input (reference source_pool.py
    FROZEN status + IntegrityManifest, collapsed to the runtime
    core): ``freeze()`` writes the dataset plus a manifest carrying
    an order-independent content hash; ``read()`` verifies the hash
    first and raises if the frozen data drifted."""

    def __init__(self, spark: SparkSession, path: str, *,
                 format: str = "parquet"):
        self.spark = spark
        self.path = path
        self.format = format
        self._manifest = os.path.join(path, "_frozen_manifest.json")

    def _content_hash(self, df: DataFrame) -> tuple[int, int]:
        row = df.select(
            F.bit_xor(F.xxhash64(F.struct(*sorted(df.columns)))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (int(row["h"] or 0), int(row["n"]))

    def freeze(self, df: DataFrame) -> dict:
        data_dir = os.path.join(self.path, "data")
        df.write.mode("errorifexists").format(self.format).save(data_dir)
        back = self.spark.read.format(self.format).load(data_dir)
        h, n = self._content_hash(back)
        manifest = {
            "format": self.format, "content_hash": h, "rows": n,
            "columns": {
                f.name: f.dataType.simpleString()
                for f in back.schema.fields
            },
            "status": "frozen",
        }
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest)
        return manifest

    def verify(self) -> dict:
        with open(self._manifest) as fh:
            manifest = json.load(fh)
        df = self.spark.read.format(manifest["format"]).load(
            os.path.join(self.path, "data")
        )
        h, n = self._content_hash(df)
        if (h, n) != (manifest["content_hash"], manifest["rows"]):
            raise AssertionError(
                f"frozen source {self.path} drifted: stored hash/rows "
                f"({manifest['content_hash']}, {manifest['rows']}) != "
                f"recomputed ({h}, {n})"
            )
        return manifest

    def read(self) -> DataFrame:
        manifest = self.verify()
        return self.spark.read.format(manifest["format"]).load(
            os.path.join(self.path, "data")
        )


def spark_session_fixture(
    *, app_name: str = "odibi-spark-test", shuffle_partitions: int = 8
):
    """A module-scope pytest fixture factory for a local session:

        from odibi_spark.testing import spark_session_fixture
        spark = spark_session_fixture()

    Deferred pytest import so this module stays importable without
    pytest installed (reference fixtures are pytest-free too)."""
    import pytest

    @pytest.fixture(scope="module")
    def spark():
        s = (
            SparkSession.builder.master("local[4]")
            .appName(app_name)
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        yield s

    return spark
