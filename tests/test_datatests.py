"""YAML data-test runner (`odibi_spark test` verb) — transform cases,
SQL cases, snapshots (reference: odibi/cli/test.py)."""

import textwrap

from odibi_spark.plans.datatests import (
    find_test_files,
    run_data_tests,
    run_test_case,
    slugify,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return p


class TestTransformCases:
    def test_transform_case_passes(self, spark, tmp_path):
        f = _write(
            tmp_path, "dedup_test.yaml",
            """
            tests:
              - name: dedup keeps latest
                transform: deduplicate
                params:
                  keys: [id]
                  order_by: [ts]
                  descending: true
                inputs:
                  events:
                    - {id: 1, ts: "2024-01-01"}
                    - {id: 1, ts: "2024-02-01"}
                    - {id: 2, ts: "2024-01-15"}
                expected:
                  - {id: 1, ts: "2024-02-01"}
                  - {id: 2, ts: "2024-01-15"}
            """,
        )
        summary = run_data_tests(spark, f)
        assert (summary.passed, summary.failed) == (1, 0), summary.cases

    def test_transform_case_fails_on_wrong_expected(self, spark, tmp_path):
        f = _write(
            tmp_path, "bad_test.yaml",
            """
            tests:
              - name: wrong expectation
                transform: distinct
                params: {}
                inputs:
                  t: [{x: 1}, {x: 1}]
                expected: [{x: 1}, {x: 1}]
            """,
        )
        summary = run_data_tests(spark, f)
        assert summary.failed == 1
        assert "differs" in summary.cases[0].message

    def test_multi_input_join_via_context(self, spark, tmp_path):
        """Secondary inputs resolve by name through the Context — the
        same mechanism the pipeline uses for `right: <node>`."""
        f = _write(
            tmp_path, "join_test.yaml",
            """
            tests:
              - name: join against dim
                transform: join
                input: facts
                params: {right: dim, "on": [k], how: inner}
                inputs:
                  facts: [{k: 1, v: 10}, {k: 2, v: 20}]
                  dim: [{k: 1, label: a}]
                expected: [{k: 1, v: 10, label: a}]
            """,
        )
        summary = run_data_tests(spark, f)
        assert (summary.passed, summary.failed) == (1, 0), summary.cases

    def test_unknown_transform_reports_cleanly(self, spark, tmp_path):
        f = _write(
            tmp_path, "unknown_test.yaml",
            """
            tests:
              - name: nope
                transform: does_not_exist
                inputs: {t: [{x: 1}]}
                expected: [{x: 1}]
            """,
        )
        summary = run_data_tests(spark, f)
        assert summary.failed == 1
        assert "unknown transform" in summary.cases[0].message


class TestSqlCases:
    def test_sql_case_runs_on_spark(self, spark, tmp_path):
        f = _write(
            tmp_path, "sql_test.yaml",
            """
            tests:
              - name: sql aggregation
                sql: SELECT g, SUM(v) AS total FROM t GROUP BY g
                inputs:
                  t: [{g: a, v: 1}, {g: a, v: 2}, {g: b, v: 5}]
                expected: [{g: a, total: 3}, {g: b, total: 5}]
            """,
        )
        summary = run_data_tests(spark, f)
        assert (summary.passed, summary.failed) == (1, 0), summary.cases

    def test_case_needs_exactly_one_of_transform_sql(self, spark, tmp_path):
        f = _write(
            tmp_path, "both_test.yaml",
            """
            tests:
              - name: ambiguous
                transform: distinct
                sql: SELECT 1
                inputs: {t: [{x: 1}]}
            """,
        )
        summary = run_data_tests(spark, f)
        assert summary.failed == 1
        assert "exactly one" in summary.cases[0].message


class TestSnapshots:
    def test_snapshot_write_then_compare(self, spark, tmp_path):
        f = _write(
            tmp_path, "snap_test.yaml",
            """
            tests:
              - name: snapshot case
                sql: SELECT g, COUNT(*) AS n FROM t GROUP BY g
                inputs:
                  t: [{g: a}, {g: a}, {g: b}]
            """,
        )
        # no snapshot yet: compare fails with guidance
        first = run_data_tests(spark, f)
        assert first.failed == 1
        assert "--snapshot" in first.cases[0].message
        # record, then compare green
        wrote = run_data_tests(spark, f, update_snapshots=True)
        assert wrote.failed == 0
        snap = tmp_path / "__snapshots__" / "snap_test" / "snapshot-case.csv"
        assert snap.exists()
        again = run_data_tests(spark, f)
        assert (again.passed, again.failed) == (1, 0), again.cases

    def test_snapshot_with_null_string_values_round_trips(self, spark, tmp_path):
        """Spark NULL stringifies as 'None', pandas.read_csv NaN as
        'nan' — snapshot compare must normalize both or a null-bearing
        case fails forever (ADVICE r8 #4)."""
        f = _write(
            tmp_path, "null_test.yaml",
            """
            tests:
              - name: nulls
                sql: >
                  SELECT g, CASE WHEN g = 'a' THEN NULL ELSE g END AS v
                  FROM t
                inputs:
                  t: [{g: a}, {g: b}]
            """,
        )
        wrote = run_data_tests(spark, f, update_snapshots=True)
        assert wrote.failed == 0
        again = run_data_tests(spark, f)
        assert (again.passed, again.failed) == (1, 0), again.cases

    def test_stale_snapshot_fails(self, spark, tmp_path):
        f = _write(
            tmp_path, "stale_test.yaml",
            """
            tests:
              - name: stale
                sql: SELECT 2 AS x
                inputs: {t: [{ignore: 1}]}
            """,
        )
        snap_dir = tmp_path / "__snapshots__" / "stale_test"
        snap_dir.mkdir(parents=True)
        (snap_dir / "stale.csv").write_text("x\n1\n")
        summary = run_data_tests(spark, f)
        assert summary.failed == 1


class TestDiscoveryAndCli:
    def test_find_test_files_conventions(self, tmp_path):
        (tmp_path / "a_test.yaml").write_text("tests: []")
        (tmp_path / "test_b.yml").write_text("tests: []")
        (tmp_path / "ignore.yaml").write_text("tests: []")
        names = {p.name for p in find_test_files(tmp_path)}
        assert names == {"a_test.yaml", "test_b.yml"}

    def test_slugify(self):
        assert slugify("Dedup keeps LATEST!") == "dedup-keeps-latest"

    def test_csv_input_reference(self, spark, tmp_path):
        (tmp_path / "dim.csv").write_text("k,label\n1,a\n")
        f = _write(
            tmp_path, "csv_input_test.yaml",
            """
            tests:
              - name: csv input
                sql: SELECT label FROM d
                inputs: {d: dim.csv}
                expected: [{label: a}]
            """,
        )
        summary = run_data_tests(spark, f)
        assert (summary.passed, summary.failed) == (1, 0), summary.cases

    def test_cli_test_verb(self, spark, tmp_path, capsys):
        """CLI exit codes: 0 all-green, 1 on failure. get_spark reuses
        the session fixture's JVM (one session per process)."""
        from odibi_spark.cli import main

        f = _write(
            tmp_path, "cli_test.yaml",
            """
            tests:
              - name: green
                sql: SELECT 1 AS one
                inputs: {t: [{x: 1}]}
                expected: [{one: 1}]
            """,
        )
        assert main(["test", str(f)]) == 0
        out = capsys.readouterr().out
        assert "1 passed, 0 failed" in out

    def test_run_test_case_unregisters_views(self, spark, tmp_path):
        f = _write(
            tmp_path, "views_test.yaml",
            """
            tests:
              - name: leaves no views
                sql: SELECT x FROM somedistinctview17
                inputs: {somedistinctview17: [{x: 1}]}
                expected: [{x: 1}]
            """,
        )
        case = {
            "name": "leaves no views",
            "sql": "SELECT x FROM somedistinctview17",
            "inputs": {"somedistinctview17": [{"x": 1}]},
            "expected": [{"x": 1}],
        }
        result = run_test_case(spark, case, f)
        assert result.ok, result.message
        assert not any(
            t.name == "somedistinctview17"
            for t in spark.catalog.listTables()
        )
