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
# per-run observability metrics, long/narrow form (reference treats
# run metrics as first-class catalog rows: odibi/catalog.py:844
# meta_metrics + derived_updater.py rollups)
METRIC_SCHEMA = (
    "run_id string, pipeline string, node string, metric string, "
    "value double, recorded_at double"
)
DAILY_STATS_GRAIN = ["date", "pipeline"]
# deployed pipeline/node definitions (reference: odibi/catalog.py:872
# meta_pipelines, :888 meta_nodes — version_hash keys staleness)
PIPELINE_SCHEMA = (
    "pipeline string, version_hash string, n_nodes bigint, "
    "config_json string, deployed_at double"
)
NODE_SCHEMA = (
    "pipeline string, node string, version_hash string, "
    "depends_on_json string, config_json string, deployed_at double"
)
# versioned schema snapshots with per-version drift columns
# (reference: odibi/catalog.py:903 meta_schemas — schema_version,
# schema_hash, columns JSON, columns_added/removed/type_changed;
# track_schema at :3248 appends only on hash change)
SCHEMA_SNAPSHOT_SCHEMA = (
    "table_path string, schema_version bigint, schema_hash string, "
    "columns_json string, captured_at double, pipeline string, "
    "node string, run_id string, columns_added string, "
    "columns_removed string, columns_type_changed string"
)


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _append(self, name: str, rows: list[tuple], schema: str) -> None:
        """Concurrent-writer-safe append: one uniquely-named file per
        call via :func:`odibi_spark.io.append.atomic_append`, so two
        pipelines recording runs/metrics into the same catalog at once
        cannot clobber each other's staging (the reference's catalog
        retries concurrent Delta commits instead —
        odibi/state/__init__.py:43-107; on an object store without
        atomic rename, that Delta-MERGE backend is the upgrade path)."""
        from odibi_spark.io.append import atomic_append

        atomic_append(self.spark, f"{self.root}/meta_{name}", rows, schema)

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

    def record_metrics(
        self, *, run_id: str, pipeline: str, node: str,
        metrics: dict[str, float],
    ) -> None:
        """Append per-run metrics in long/narrow (metric, value) form —
        one catalog table serves every metric family (row counts,
        durations, validation failure counts) without schema churn,
        the reference's meta_metrics posture (odibi/catalog.py:844)."""
        now = time.time()
        self._append(
            "metrics",
            [(run_id, pipeline, node, k, float(v), now)
             for k, v in metrics.items()],
            METRIC_SCHEMA,
        )

    def update_daily_stats(
        self,
        *,
        pipeline: str,
        results: dict,
        started_at: float,
        finished_at: float,
    ) -> DataFrame:
        """Fold ONE run into the ``meta_daily_stats`` derived rollup
        (reference: odibi/catalog.py:1085, PK (date, pipeline_name),
        upserted by derived_updater on pipeline completion). Built on
        the incremental-aggregation pattern with merge_sum, so each
        run contributes a single pre-aggregated row and history is
        never rescanned — O(days x pipelines) table, O(1) per run."""
        from odibi_spark.patterns.aggregation import aggregate_incremental

        ok = all(r.status == "success" for r in results.values())
        batch = self.spark.createDataFrame(
            [(
                time.strftime("%Y-%m-%d", time.gmtime(started_at)),
                pipeline,
                1,
                1 if ok else 0,
                0 if ok else 1,
                int(sum(r.rows_written or 0 for r in results.values())),
                float(round(finished_at - started_at, 3)),
            )],
            "date string, pipeline string, runs bigint, successes bigint, "
            "failures bigint, total_rows bigint, total_duration_s double",
        )
        return aggregate_incremental(
            self.spark, batch,
            target_path=f"{self.root}/meta_daily_stats",
            grain=DAILY_STATS_GRAIN,
            measures={
                "runs": "sum(runs)",
                "successes": "sum(successes)",
                "failures": "sum(failures)",
                "total_rows": "sum(total_rows)",
                "total_duration_s": "sum(total_duration_s)",
            },
            strategy="merge_sum",
        )

    def deploy(self, config) -> str:
        """Record a pipeline's definition in the catalog (reference CLI
        ``deploy`` verb: odibi/cli/main.py:439 — definitions become
        queryable metadata). Appends one meta_pipelines row + one
        meta_nodes row per node, keyed by a content hash of the config
        so repeated deploys of identical YAML are detectable (latest
        row per (pipeline, version_hash) wins on read). Returns the
        version hash."""
        import hashlib

        cfg_json = config.model_dump_json()
        vh = hashlib.sha256(cfg_json.encode()).hexdigest()[:16]
        now = time.time()
        self._append(
            "pipelines",
            [(config.name, vh, len(config.nodes), cfg_json, now)],
            PIPELINE_SCHEMA,
        )
        self._append(
            "nodes",
            [
                (
                    config.name, n.name, vh,
                    json.dumps(n.depends_on), n.model_dump_json(), now,
                )
                for n in config.nodes
            ],
            NODE_SCHEMA,
        )
        return vh

    def pipelines(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_pipelines")

    def nodes(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_nodes")

    def snapshot_schema(
        self,
        table_path: str,
        df: DataFrame,
        *,
        pipeline: str | None = None,
        node: str | None = None,
        run_id: str | None = None,
    ) -> dict:
        """Versioned schema snapshot with drift detection (reference
        ``track_schema``, odibi/catalog.py:3248 + meta_schemas schema
        at :903): hash the canonical {column: type} map; when it
        differs from the latest recorded version, append ONE row to
        ``meta_schema_snapshots`` carrying the bumped version and the
        computed drift (columns added / removed / type-changed as
        sorted JSON arrays). An unchanged schema appends nothing.

        Returns {"changed", "version"} (+ "previous_version" and the
        drift lists when changed). Version assignment is
        read-latest-then-append like the reference's — two concurrent
        first writers of the SAME table can race a version number;
        the snapshot log still records both schemas (the reference's
        Delta-MERGE backend is the upgrade path, same posture as
        ``_append``)."""
        import hashlib

        cols = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        canon = json.dumps(cols, sort_keys=True)
        schema_hash = hashlib.md5(canon.encode()).hexdigest()
        prev = None
        if self._exists("schema_snapshots"):
            rows = (
                self.schema_snapshots(table_path)
                .orderBy("schema_version", ascending=False)
                .limit(1)
                .collect()
            )
            prev = rows[0] if rows else None
        if prev is not None and prev.schema_hash == schema_hash:
            return {"changed": False, "version": int(prev.schema_version)}
        if prev is not None:
            prev_cols = json.loads(prev.columns_json)
            added = sorted(set(cols) - set(prev_cols))
            removed = sorted(set(prev_cols) - set(cols))
            changed = sorted(
                c for c in cols if c in prev_cols and cols[c] != prev_cols[c]
            )
            version = int(prev.schema_version) + 1
        else:
            added, removed, changed = sorted(cols), [], []
            version = 1
        self._append(
            "schema_snapshots",
            [(
                table_path, version, schema_hash, canon, time.time(),
                pipeline, node, run_id,
                json.dumps(added), json.dumps(removed), json.dumps(changed),
            )],
            SCHEMA_SNAPSHOT_SCHEMA,
        )
        return {
            "changed": True,
            "version": version,
            "previous_version": int(prev.schema_version) if prev else None,
            "columns_added": added,
            "columns_removed": removed,
            "columns_type_changed": changed,
        }

    def sync_table(
        self,
        *,
        table_path: str,
        pipeline: str,
        node: str,
        df: DataFrame,
        format: str = "parquet",
        run_id: str | None = None,
    ) -> dict:
        """Table-registration sync (reference catalog post-write sync:
        register the table row AND track its schema in one call):
        appends the ``meta_tables`` registration row and takes a
        versioned ``meta_schema_snapshots`` drift snapshot. Returns
        the snapshot result."""
        self.record_table(
            table_path=table_path, pipeline=pipeline, node=node,
            df=df, format=format,
        )
        return self.snapshot_schema(
            table_path, df, pipeline=pipeline, node=node, run_id=run_id,
        )

    def schema_snapshots(self, table_path: str | None = None) -> DataFrame:
        """The versioned snapshot log as a queryable meta table."""
        df = self.spark.read.parquet(f"{self.root}/meta_schema_snapshots")
        if table_path is not None:
            df = df.filter(df.table_path == table_path)
        return df

    def schema_drift(self, table_path: str | None = None) -> DataFrame:
        """Schema DRIFT history: every snapshot beyond each table's
        first version — i.e. the moments a table's shape actually
        changed, with what changed (reference CLI ``schema history``
        drift view). Ordered newest-first."""
        from pyspark.sql import functions as F

        return (
            self.schema_snapshots(table_path)
            .filter(F.col("schema_version") > 1)
            .select(
                "table_path", "schema_version", "captured_at",
                "pipeline", "node", "run_id",
                "columns_added", "columns_removed", "columns_type_changed",
            )
            .orderBy(F.desc("captured_at"))
        )

    def schema_history(self, table_path: str | None = None) -> DataFrame:
        """Recorded schema versions over time (reference meta_schemas,
        odibi/catalog.py:903; CLI ``schema history``): meta_tables
        appends one row with schema_json per successful catalogued
        write, so the history IS the append log — deduplicated to
        schema-change points, ordered oldest-first per table."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        t = self.tables()
        if table_path is not None:
            t = t.filter(t.table_path == table_path)
        w = Window.partitionBy("table_path").orderBy("updated_at")
        return (
            t.withColumn("__prev", F.lag("schema_json").over(w))
            .filter(
                F.col("__prev").isNull()
                | (F.col("__prev") != F.col("schema_json"))
            )
            .select("table_path", "schema_json", "updated_at")
            .orderBy("table_path", "updated_at")
        )

    def schema_diff(self, table_path: str) -> dict:
        """Diff the last two recorded schema versions of a table
        (reference CLI ``schema diff``). Returns {added, removed,
        changed, from_at, to_at}; a table with fewer than two recorded
        versions diffs against an empty schema."""
        hist = self.schema_history(table_path).collect()
        if not hist:
            raise ValueError(f"no recorded schema for '{table_path}'")
        prev = json.loads(hist[-2].schema_json) if len(hist) > 1 else {}
        cur = json.loads(hist[-1].schema_json)
        return {
            "table_path": table_path,
            "added": {c: t for c, t in cur.items() if c not in prev},
            "removed": {c: t for c, t in prev.items() if c not in cur},
            "changed": {
                c: {"from": prev[c], "to": cur[c]}
                for c in cur
                if c in prev and prev[c] != cur[c]
            },
            "from_at": hist[-2].updated_at if len(hist) > 1 else None,
            "to_at": hist[-1].updated_at,
        }

    @property
    def derived_guard(self):
        """Exactly-once claim lifecycle for derived-table folds
        (reference: odibi/derived_updater.py meta_derived_applied_runs
        guard; open-format twin patterns/derived_guard.py). Rows are
        queryable via ``derived_guard.claims(spark)`` — the
        meta-table surface."""
        from odibi_spark.patterns.derived_guard import DerivedGuard

        if not hasattr(self, "_derived_guard"):
            self._derived_guard = DerivedGuard(
                f"{self.root}/meta_derived_applied_runs"
            )
        return self._derived_guard

    def state_backend(self):
        """HWM state stored IN the catalog as ``meta_state`` — the
        reference's catalog state backend posture
        (odibi/state/__init__.py catalog-Delta backend; schema
        odibi/catalog.py meta_state key/value). Pass to incremental
        nodes/`run_incremental_dedup` like any other StateBackend."""
        from odibi_spark.state.hwm import ParquetStateBackend

        return ParquetStateBackend(self.spark, f"{self.root}/meta_state")

    def state(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_state")

    def sla_status(
        self, expected_every_hours: dict[str, float],
        *, now: float | None = None,
    ) -> DataFrame:
        """Freshness SLA snapshot (reference: meta_sla_status,
        odibi/catalog.py table list + derived_updater): for each
        pipeline with a declared cadence, the hours since its last
        SUCCESSFUL run and whether that breaches the expectation.
        A pipeline with a declared SLA but no successful run ever is a
        breach (hours_since_success = NULL, breached = true). Derived
        from pipeline_health on demand — cannot drift."""
        from pyspark.sql import functions as F

        ref = float(now if now is not None else time.time())
        sla = self.spark.createDataFrame(
            [(p, float(h)) for p, h in expected_every_hours.items()],
            "pipeline string, expected_every_hours double",
        )
        health = self.pipeline_health(now=ref).select(
            "pipeline", "last_success_at"
        )
        hours = (F.lit(ref) - F.col("last_success_at")) / F.lit(3600.0)
        return (
            sla.join(health, "pipeline", "left")
            .select(
                "pipeline",
                "expected_every_hours",
                F.round(hours, 3).alias("hours_since_success"),
                F.coalesce(
                    hours > F.col("expected_every_hours"), F.lit(True)
                ).alias("breached"),
            )
        )

    # -- maintenance (reference: odibi/cli/system.py — the `odibi
    # system` verb family: cleanup / rebuild-summaries / optimize /
    # sync, executed here on the open-format catalog) ----------------

    #: retention-eligible tables → (age column, kind). Definition
    #: tables (meta_pipelines/meta_nodes/meta_schemas/meta_state) are
    #: never retention-deleted: they are current-state, not history.
    #: meta_tables is BOTH: its append log is the schema history (old
    #: rows retention-eligible) but its newest row per table_path is
    #: the current-state registry, so cleanup() always exempts that
    #: latest row — the reference's cleanup never touches the table
    #: registry at all (odibi/cli/system.py trims only daily_stats/
    #: failures/observability).
    RETENTION_TABLES = {
        "runs": ("finished_at", "epoch"),
        "metrics": ("recorded_at", "epoch"),
        "tables": ("updated_at", "epoch"),
        "daily_stats": ("date", "date_str"),
    }

    def _table_path(self, name: str) -> str:
        return f"{self.root}/meta_{name}"

    def _exists(self, name: str) -> bool:
        from odibi_spark.io.compact import _fs_for

        fs, jpath, _ = _fs_for(self.spark, self._table_path(name))
        return fs.exists(jpath)

    def _rewrite(self, name: str, df: DataFrame) -> int:
        """Replace table ``name``'s contents with ``df`` through the
        compaction module's rename-before-delete swap (crash-safe: a
        failed rename aborts with originals intact; a crash mid-delete
        is finished by the next maintenance run)."""
        from odibi_spark.io.compact import (
            list_data_files,
            resume_pending_deletes,
            swap_data_files,
        )

        path = self._table_path(name)
        resume_pending_deletes(self.spark, path)
        old = [f for f, _ in list_data_files(self.spark, path)]
        tmp = path + "__retention_tmp"
        # catalog tables are O(runs) small — one output file keeps the
        # directory listing cheap for every later catalog query
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        return swap_data_files(self.spark, path, tmp, old)

    def cleanup(
        self,
        retention_days: int | dict[str, int],
        *,
        now: float | None = None,
        dry_run: bool = False,
    ) -> dict[str, dict]:
        """Delete catalog history older than the retention window
        (reference: system.py:385-448 `_cleanup_command` with
        per-table RetentionConfig cutoffs + --dry-run counts).

        ``retention_days`` is a single window for every history table
        or a {table: days} mapping (tables absent from the mapping are
        skipped). Returns {table: {expired, kept, deleted}} — with
        ``dry_run`` nothing is rewritten and deleted is 0.
        """
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        ref = float(now if now is not None else time.time())
        report: dict[str, dict] = {}
        for name, (col, kind) in self.RETENTION_TABLES.items():
            if isinstance(retention_days, dict):
                if name not in retention_days:
                    continue
                days = retention_days[name]
            else:
                days = retention_days
            if not self._exists(name):
                continue
            df = self.spark.read.parquet(self._table_path(name))
            if kind == "epoch":
                expired_pred = F.col(col) < F.lit(ref - days * 86400.0)
            else:  # date_str yyyy-mm-dd compares lexicographically
                cutoff = time.strftime(
                    "%Y-%m-%d", time.gmtime(ref - days * 86400.0)
                )
                expired_pred = F.col(col) < F.lit(cutoff)
            if name == "tables":
                # the newest row per table_path IS the registry (and
                # schema_history's latest version) — exempt it so a
                # table that simply hasn't been written within the
                # window keeps its current-state entry
                w = Window.partitionBy("table_path").orderBy(
                    F.col(col).desc_nulls_last()
                )
                df = df.withColumn("__rk", F.row_number().over(w))
                expired_pred = expired_pred & (F.col("__rk") > 1)
            expired = df.filter(expired_pred).count()
            kept = df.filter(~expired_pred | F.col(col).isNull())
            if name == "tables":
                kept = kept.drop("__rk")
            n_kept = kept.count()
            entry = {"expired": expired, "kept": n_kept, "deleted": 0}
            if expired and not dry_run:
                self._rewrite(name, kept)
                entry["deleted"] = expired
            report[name] = entry
        return report

    def rebuild_daily_stats(self) -> DataFrame:
        """Recompute ``meta_daily_stats`` from ``meta_runs`` from
        scratch (reference: system.py:212 `rebuild-summaries` —
        derived tables can drift from their facts if a writer died
        mid-upsert; the repair is a full recompute). Produces exactly
        what folding every run through ``update_daily_stats`` would
        have: per-run rollup first (a run is successful when EVERY
        node row succeeded), then the (date, pipeline) grain.

        Retention interaction: runs older than meta_runs' retention
        window cannot be rebuilt, so existing daily_stats rows whose
        date predates the earliest surviving run are PRESERVED (merged
        back in) rather than silently discarded — otherwise a cleanup
        with {runs: 30, daily_stats: 365} followed by a rebuild would
        destroy 11 months of stats its own retention said to keep."""
        from pyspark.sql import functions as F

        per_run = self.runs().groupBy("run_id", "pipeline").agg(
            F.min("started_at").alias("started_at"),
            F.max("finished_at").alias("finished_at"),
            F.min((F.col("status") == "success").cast("int")).alias("ok"),
            F.sum(F.coalesce("rows_written", F.lit(0))).alias("rows"),
        )
        rebuilt = (
            per_run.withColumn(
                # UTC-pinned via pure epoch arithmetic so rebuild and
                # update_daily_stats (time.gmtime, always UTC) assign
                # a run to the SAME date whatever the session timezone
                "date",
                F.date_add(
                    F.to_date(F.lit("1970-01-01")),
                    F.floor(F.col("started_at") / 86400).cast("int"),
                ).cast("string"),
            )
            .groupBy("date", "pipeline")
            .agg(
                F.count(F.lit(1)).alias("runs"),
                F.sum("ok").alias("successes"),
                (F.count(F.lit(1)) - F.sum("ok")).alias("failures"),
                F.sum("rows").alias("total_rows"),
                F.sum(
                    F.round(F.col("finished_at") - F.col("started_at"), 3)
                ).alias("total_duration_s"),
            )
        )
        if self._exists("daily_stats"):
            oldest = per_run.agg(F.min("started_at")).first()[0]
            if oldest is not None:
                floor_date = time.strftime("%Y-%m-%d", time.gmtime(oldest))
                preserved = self.daily_stats().filter(
                    F.col("date") < floor_date
                )
                rebuilt = preserved.unionByName(rebuilt)
            self._rewrite("daily_stats", rebuilt)
        else:
            rebuilt.coalesce(1).write.mode("overwrite").parquet(
                self._table_path("daily_stats")
            )
        return self.daily_stats()

    def optimize(self, *, target_file_bytes: int = 32 * 1024 * 1024) -> dict:
        """Compact every meta table's small files (reference:
        system.py:328 `optimize` — OPTIMIZE + VACUUM on the Delta
        catalog; here the open-format bin-packing twin). Append-heavy
        tables (runs/metrics) accrete one file per pipeline run."""
        from odibi_spark.io.compact import compact_small_files

        out = {}
        for name in (
            "runs", "metrics", "tables", "daily_stats",
            "pipelines", "nodes", "schemas", "state",
        ):
            if self._exists(name):
                out[name] = compact_small_files(
                    self.spark, self._table_path(name),
                    target_file_bytes=target_file_bytes,
                )
        return out

    def sync_to(self, target_root: str) -> dict[str, int]:
        """Copy every present meta table to another catalog root
        (reference: system.py:143 `sync` between catalog backends).
        Full-refresh copy: each table is small, and overwrite keeps
        the target consistent even after source retention deletes."""
        out = {}
        for name in (
            "runs", "metrics", "tables", "daily_stats",
            "pipelines", "nodes", "schemas", "state",
        ):
            if not self._exists(name):
                continue
            df = self.spark.read.parquet(self._table_path(name))
            df.coalesce(1).write.mode("overwrite").parquet(
                f"{target_root.rstrip('/')}/meta_{name}"
            )
            out[name] = df.count()
        return out

    def runs(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_runs")

    def tables(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_tables")

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_metrics")

    def daily_stats(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/meta_daily_stats")

    def pipeline_health(self, *, now: float | None = None) -> DataFrame:
        """Per-pipeline health snapshot (reference: odibi/catalog.py
        meta_pipeline_health, maintained by derived_updater upserts).
        Computed on demand from meta_runs instead of maintained as a
        second table — meta_runs is O(runs x nodes) small, one
        aggregate is cheaper and can never drift from its source.
        A run is successful when EVERY node row of it succeeded."""
        from pyspark.sql import functions as F

        ref = float(now if now is not None else time.time())
        runs = self.runs().groupBy("run_id", "pipeline").agg(
            F.min(
                (F.col("status") == "success").cast("int")
            ).alias("ok"),
            F.max("finished_at").alias("finished_at"),
            F.sum("rows_written").alias("rows_written"),
            F.max("duration_s").alias("duration_s"),
        )
        week = ref - 7 * 86400.0
        month = ref - 30 * 86400.0
        ok_at = lambda since: (  # noqa: E731
            F.sum(F.when(F.col("finished_at") >= since,
                         F.col("ok")).otherwise(F.lit(0))),
            F.sum(F.when(F.col("finished_at") >= since,
                         F.lit(1)).otherwise(F.lit(0))),
        )
        ok7, n7 = ok_at(week)
        ok30, n30 = ok_at(month)
        return runs.groupBy("pipeline").agg(
            F.count(F.lit(1)).alias("total_runs"),
            F.sum("ok").alias("total_successes"),
            (F.count(F.lit(1)) - F.sum("ok")).alias("total_failures"),
            (ok7 / F.nullif(n7, F.lit(0))).alias("success_rate_7d"),
            (ok30 / F.nullif(n30, F.lit(0))).alias("success_rate_30d"),
            F.sum(
                F.when(F.col("finished_at") >= month, F.col("rows_written"))
            ).alias("total_rows_30d"),
            F.max(
                F.when(F.col("ok") == 1, F.col("finished_at"))
            ).alias("last_success_at"),
            F.max(
                F.when(F.col("ok") == 0, F.col("finished_at"))
            ).alias("last_failure_at"),
            F.max("finished_at").alias("last_run_at"),
        )


def run_pipeline_with_catalog(pipeline, *, catalog: Catalog, parallel: bool = False):
    """Run a Pipeline and record per-node results + lineage metadata
    (reference post-run: catalog sync + lineage emit, SURVEY §3.1.6)."""
    run_id = str(uuid.uuid4())
    t0 = time.time()
    results = pipeline.run(parallel=parallel)
    t1 = time.time()
    name = pipeline.config.name
    catalog.record_run(
        run_id=run_id, pipeline=name, results=results,
        started_at=t0, finished_at=t1,
    )
    # per-node observability metrics: rows/duration plus one row per
    # validation test's failure count and pass flag
    for node_name, r in results.items():
        metrics: dict[str, float] = {
            "rows_written": float(r.rows_written or 0),
            "duration_s": float(r.duration_s or 0.0),
        }
        for v in r.validation or []:
            metrics[f"validation.{v.name}.failed_rows"] = float(v.failed_rows)
            metrics[f"validation.{v.name}.passed"] = 1.0 if v.passed else 0.0
        catalog.record_metrics(
            run_id=run_id, pipeline=name, node=node_name, metrics=metrics,
        )
    # exactly-once derived fold (r13, reference derived_updater.py
    # claim lifecycle): a replayed/retried run_id must not double-
    # count into the meta_daily_stats rollup — the guard's first
    # claimant folds, every later replay sees the claim and skips
    catalog.derived_guard.apply_once(
        "meta_daily_stats", run_id,
        lambda: catalog.update_daily_stats(
            pipeline=name, results=results, started_at=t0, finished_at=t1,
        ),
    )
    for node in pipeline.config.nodes:
        if node.write and node.write.path and results[node.name].status == "success":
            # r14: registration + versioned schema snapshot in one
            # sync — meta_schema_snapshots gains a drift row whenever
            # a run changes a table's shape (reference track_schema
            # per catalogued write)
            catalog.sync_table(
                table_path=node.write.path, pipeline=pipeline.config.name,
                node=node.name, df=pipeline.context.get(node.name),
                format=node.write.format, run_id=run_id,
            )
    return run_id, results
