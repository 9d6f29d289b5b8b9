"""Catalog maintenance — the `system` verb family: retention cleanup,
derived-table rebuild, compaction, sync (reference: odibi/cli/system.py)."""

import json
import time

import pytest

from odibi_spark.catalog import Catalog


class R:
    def __init__(self, status="success", rows=10):
        self.status = status
        self.rows_written = rows
        self.error = None
        self.duration_s = 1.0


def _seed(spark, root, now):
    """Two runs: one 100 days old, one fresh; metrics for both."""
    cat = Catalog(spark, root)
    cat.record_run(
        run_id="old", pipeline="p", results={"a": R(), "b": R()},
        started_at=now - 100 * 86400, finished_at=now - 100 * 86400 + 10,
    )
    cat.record_run(
        run_id="new", pipeline="p", results={"a": R(), "b": R("failed")},
        started_at=now - 60, finished_at=now - 30,
    )
    cat.record_metrics(
        run_id="new", pipeline="p", node="a", metrics={"rows": 10.0}
    )
    cat.update_daily_stats(
        pipeline="p", results={"a": R()},
        started_at=now - 100 * 86400, finished_at=now - 100 * 86400 + 10,
    )
    cat.update_daily_stats(
        pipeline="p", results={"a": R()},
        started_at=now - 60, finished_at=now - 30,
    )
    return cat


class TestCleanup:
    def test_dry_run_counts_but_keeps(self, spark, tmp_path):
        now = time.time()
        cat = _seed(spark, str(tmp_path / "_sys"), now)
        report = cat.cleanup(90, now=now, dry_run=True)
        assert report["runs"]["expired"] == 2  # 2 node rows of the old run
        assert report["runs"]["deleted"] == 0
        assert cat.runs().count() == 4

    def test_cleanup_deletes_only_expired(self, spark, tmp_path):
        now = time.time()
        cat = _seed(spark, str(tmp_path / "_sys"), now)
        report = cat.cleanup(90, now=now)
        assert report["runs"]["deleted"] == 2
        remaining = cat.runs()
        assert remaining.count() == 2
        assert {r.run_id for r in remaining.collect()} == {"new"}
        # daily_stats: the 100-day-old date row went away too
        assert report["daily_stats"]["deleted"] == 1
        assert cat.daily_stats().count() == 1
        # metrics were all fresh
        assert report["metrics"]["expired"] == 0
        assert cat.metrics().count() == 1

    def test_per_table_retention_mapping_skips_absent(self, spark, tmp_path):
        now = time.time()
        cat = _seed(spark, str(tmp_path / "_sys"), now)
        report = cat.cleanup({"runs": 90}, now=now)
        assert set(report) == {"runs"}
        assert cat.daily_stats().count() == 2  # untouched

    def test_cleanup_everything_leaves_readable_table(self, spark, tmp_path):
        now = time.time()
        cat = _seed(spark, str(tmp_path / "_sys"), now)
        cat.cleanup(0, now=now + 86400)
        assert cat.runs().count() == 0  # empty but still readable
        assert "run_id" in cat.runs().columns


class TestRebuild:
    def test_rebuild_matches_incremental_fold(self, spark, tmp_path):
        """A drifted (here: deleted) daily_stats table rebuilt from
        meta_runs equals what the per-run incremental folds produced."""
        now = time.time()
        cat = _seed(spark, str(tmp_path / "_sys"), now)
        before = {
            (r.date, r.pipeline): r.asDict()
            for r in cat.daily_stats().collect()
        }
        rebuilt = {
            (r.date, r.pipeline): r.asDict()
            for r in cat.rebuild_daily_stats().collect()
        }
        assert set(rebuilt) == set(before)
        for key, row in rebuilt.items():
            # seed folded only the "a" node per daily_stats call but
            # recorded runs with two nodes — rows differ there by
            # construction; runs/successes/failures must agree
            assert row["runs"] == before[key]["runs"]

    def test_rebuild_from_scratch(self, spark, tmp_path):
        now = time.time()
        root = str(tmp_path / "_sys2")
        cat = Catalog(spark, root)
        cat.record_run(
            run_id="r1", pipeline="p", results={"a": R(), "b": R("failed")},
            started_at=now - 60, finished_at=now - 30,
        )
        out = {r.pipeline: r.asDict() for r in cat.rebuild_daily_stats().collect()}
        assert out["p"]["runs"] == 1
        assert out["p"]["successes"] == 0  # one node failed => run failed
        assert out["p"]["failures"] == 1
        assert out["p"]["total_duration_s"] == pytest.approx(30.0, abs=0.01)


class TestOptimizeAndSync:
    def test_optimize_compacts_many_small_run_files(self, spark, tmp_path):
        now = time.time()
        root = str(tmp_path / "_sys")
        cat = Catalog(spark, root)
        for i in range(6):  # each record_run appends its own file(s)
            cat.record_run(
                run_id=f"r{i}", pipeline="p", results={"a": R()},
                started_at=now - 60, finished_at=now - 30,
            )
        n_before = cat.runs().count()
        stats = cat.optimize()
        assert stats["runs"]["compacted"] is True
        assert stats["runs"]["files_after"] < stats["runs"]["files_before"]
        assert cat.runs().count() == n_before  # lossless

    def test_sync_copies_all_present_tables(self, spark, tmp_path):
        now = time.time()
        cat = _seed(spark, str(tmp_path / "_src"), now)
        counts = cat.sync_to(str(tmp_path / "_dst"))
        assert counts["runs"] == 4
        dst = Catalog(spark, str(tmp_path / "_dst"))
        assert dst.runs().count() == 4
        assert dst.daily_stats().count() == 2

    def test_cli_system_cleanup_and_rebuild(self, spark, tmp_path, capsys):
        from odibi_spark.cli import main

        now = time.time()
        root = str(tmp_path / "_sys")
        _seed(spark, root, now)
        assert main([
            "system", "cleanup", "--root", root,
            "--retention-days", "90", "--dry-run",
        ]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["dry_run"] is True
        assert out["tables"]["runs"]["expired"] == 2
        assert main(["system", "rebuild-summaries", "--root", root]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["daily_stats_rows"] == 2
        assert main(["system", "sync", "--root", root]) == 2  # no --target
