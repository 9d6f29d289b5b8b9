"""System catalog: run/node/table metadata persisted as small parquet
tables (reference: odibi/catalog.py:146 CatalogManager with
``meta_pipelines/meta_nodes/meta_runs/meta_tables/meta_metrics/
meta_state`` Delta tables; live example examples/odibi-metrics/data/
_system_catalog/).

On a cluster these become Delta tables with MERGE upserts; here the
parquet key-value/append forms keep identical schemas.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


RUN_SCHEMA = (
    "run_id string, pipeline string, node string, status string, "
    "rows_written bigint, error string, duration_s double, "
    "started_at double, finished_at double"
)
TABLE_SCHEMA = (
    "table_path string, pipeline string, node string, format string, "
    "schema_json string, updated_at double"
)


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _append(self, name: str, rows: list[tuple], schema: str) -> None:
        df = self.spark.createDataFrame(rows, schema)
        df.write.mode("append").parquet(f"{self.root}/meta_{name}")

    def record_run(
        self,
        *,
        run_id: str,
        pipeline: str,
        results: dict,
        started_at: float,
        finished_at: float,
    ) -> None:
        rows = [
            (
                run_id, pipeline, name, r.status,
                r.rows_written, r.error, r.duration_s,
                started_at, finished_at,
            )
            for name, r in results.items()
        ]
        self._append("runs", rows, RUN_SCHEMA)

    def record_table(
        self, *, table_path: str, pipeline: str, node: str, df: DataFrame,
        format: str = "parquet",
    ) -> None:
        schema_json = json.dumps(
            {f.name: f.dataType.simpleString() for f in df.schema.fields}
        )
        self._append(
            "tables",
            [(table_path, pipeline, node, format, schema_json, time.time())],
            TABLE_SCHEMA,
        )

    def runs(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_runs")

    def tables(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_tables")


def run_pipeline_with_catalog(pipeline, *, catalog: Catalog, parallel: bool = False):
    """Run a Pipeline and record per-node results + lineage metadata
    (reference post-run: catalog sync + lineage emit, SURVEY §3.1.6)."""
    run_id = str(uuid.uuid4())
    t0 = time.time()
    results = pipeline.run(parallel=parallel)
    catalog.record_run(
        run_id=run_id, pipeline=pipeline.config.name, results=results,
        started_at=t0, finished_at=time.time(),
    )
    for node in pipeline.config.nodes:
        if node.write and node.write.path and results[node.name].status == "success":
            catalog.record_table(
                table_path=node.write.path, pipeline=pipeline.config.name,
                node=node.name, df=pipeline.context.get(node.name),
                format=node.write.format,
            )
    return run_id, results
