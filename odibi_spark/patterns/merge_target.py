"""Target-table abstraction for merge-style patterns.

The reference performs all merge patterns through Delta MERGE
(odibi/transformers/scd.py:553-735, merge_transformer.py:406-640).
Without Delta jars, ``ParquetTarget`` gives the same row semantics via
read -> transform -> overwrite with a localCheckpoint barrier. The
interface is the seam where ``DeltaTarget`` (partition-pruned,
ACID-transactional MERGE) plugs in on a real cluster — call sites are
identical.

Caveat of the parquet emulation (Delta versioning solves this): a
DataFrame handle returned BEFORE a later overwrite of the same target
references deleted files. Re-read (or ``spark.catalog.refreshByPath``)
after every apply; pattern functions always return a fresh read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetTarget:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        if not os.path.exists(self.path):
            return False
        try:
            self.spark.read.parquet(self.path).schema
            return True
        except Exception:
            return False

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        # barrier: the new contents usually derive from read(); cut the
        # lineage so the overwrite doesn't truncate its own input
        df.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)

    def write_initial(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.path)
