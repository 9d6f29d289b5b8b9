"""Orchestrator exporters: generated Airflow/Dagster code must be
syntactically valid Python, carry every node as a task/asset, and wire
the depends_on edges. No airflow/dagster import needed — the generated
text is compiled, not executed."""

import ast

import pytest

from odibi_spark.orchestration import (
    DagsterFactory,
    render_airflow_dag,
    render_dagster_definitions,
)
from odibi_spark.plans.config import load_pipeline_yaml

YAML = """
name: demo_flow
nodes:
  - name: bronze
    read: {path: "/data/in.parquet"}
  - name: silver-clean
    depends_on: [bronze]
    read: {path: "/data/in.parquet"}
  - name: gold
    depends_on: [silver-clean]
    read: {path: "/data/in.parquet"}
"""


@pytest.fixture()
def cfg():
    return load_pipeline_yaml(YAML)


class TestAirflowExport:
    def test_generated_dag_compiles_and_wires_edges(self, cfg):
        code = render_airflow_dag(cfg, yaml_path="/etc/pipe.yaml")
        compile(code, "generated_dag.py", "exec")  # syntax gate
        # every node is a task with its ORIGINAL name as task_id and a
        # CLI bash command naming it
        for node in ("bronze", "silver-clean", "gold"):
            assert f'task_id="{node}"' in code
            assert f"--node {node}" in code
        assert "/etc/pipe.yaml" in code
        # dependency edges on the sanitized variable names
        assert "bronze >> silver_clean" in code
        assert "silver_clean >> gold" in code
        assert 'DAG(\n    "odibi_spark_demo_flow"' in code

    def test_owner_and_retries_rendered(self, cfg):
        code = render_airflow_dag(
            cfg, yaml_path="p.yaml", owner="data-eng", retries=3
        )
        assert '"owner": "data-eng"' in code
        assert '"retries": 3' in code

    def test_sanitized_collision_raises(self):
        cfg = load_pipeline_yaml(
            """
name: clash
nodes:
  - name: a-b
    read: {path: "/x.parquet"}
  - name: a_b
    read: {path: "/x.parquet"}
"""
        )
        with pytest.raises(ValueError, match="collision"):
            render_airflow_dag(cfg, yaml_path="p.yaml")

    def test_generated_dag_has_no_package_imports(self, cfg):
        """The DAG file must load inside an Airflow scheduler venv
        where neither pyspark nor this package exists."""
        code = render_airflow_dag(cfg, yaml_path="p.yaml")
        tree = ast.parse(code)
        mods = {
            n.module if isinstance(n, ast.ImportFrom)
            else n.names[0].name
            for n in ast.walk(tree)
            if isinstance(n, (ast.Import, ast.ImportFrom))
        }
        assert all(
            m.split(".")[0] in {"airflow", "datetime"} for m in mods
        ), mods


class TestDagsterExport:
    def test_generated_definitions_compile_with_assets(self, cfg):
        code = render_dagster_definitions(cfg, yaml_path="/etc/pipe.yaml")
        compile(code, "definitions.py", "exec")
        for asset in ("bronze", "silver_clean", "gold"):
            assert f'name="{asset}"' in code
            assert f"def {asset}(" in code
        assert "deps=['silver_clean']" in code or 'deps=["silver_clean"]' in code
        assert "Definitions(assets=[bronze, silver_clean, gold])" in code
        assert "PIPELINE_YAML = '/etc/pipe.yaml'" in code  # repr-rendered

    def test_asset_name_collision_raises(self):
        cfg = load_pipeline_yaml(
            """
name: clash
nodes:
  - name: x-y
    read: {path: "/x.parquet"}
  - name: x_y
    read: {path: "/x.parquet"}
"""
        )
        with pytest.raises(ValueError, match="collision"):
            render_dagster_definitions(cfg, yaml_path="p.yaml")

    def test_factory_raises_cleanly_without_dagster(self, cfg):
        pytest.importorskip  # documented gate: dagster absent here
        try:
            import dagster  # noqa: F401

            pytest.skip("dagster installed — factory would succeed")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="render_dagster_definitions"):
            DagsterFactory(cfg, yaml_path="p.yaml").create_definitions()


class TestPerNodeRun:
    """run --node: the per-task entry point exported DAG tasks call —
    dependencies are read from their written parquet targets, never
    recomputed."""

    def _yaml(self, tmp_path):
        import pandas as pd

        pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]}).to_parquet(
            tmp_path / "in.parquet"
        )
        return f"""
name: pernode
nodes:
  - name: bronze
    read: {{path: "{tmp_path}/in.parquet"}}
    write: {{path: "{tmp_path}/bronze_out", mode: overwrite}}
  - name: silver
    depends_on: [bronze]
    transform:
      - sql: "SELECT k, v * 2 AS v2 FROM bronze WHERE k <= 3"
    write: {{path: "{tmp_path}/silver_out", mode: overwrite}}
"""

    def test_run_node_sequence_matches_pipeline(self, spark, tmp_path):
        from odibi_spark.plans.config import load_pipeline_yaml
        from odibi_spark.plans.pipeline import Pipeline

        cfg = load_pipeline_yaml(self._yaml(tmp_path))
        # orchestrator order: bronze task, then silver task — separate
        # Pipeline objects simulate separate processes
        r1 = Pipeline(cfg, spark).run_node("bronze")
        assert r1.status == "success", r1.error
        r2 = Pipeline(cfg, spark).run_node("silver")
        assert r2.status == "success", r2.error
        out = {
            r.k: r.v2
            for r in spark.read.parquet(f"{tmp_path}/silver_out").collect()
        }
        assert out == {1: 20.0, 2: 40.0, 3: 60.0}

    def test_run_node_requires_materialized_deps(self, spark, tmp_path):
        import pandas as pd

        from odibi_spark.plans.config import load_pipeline_yaml
        from odibi_spark.plans.pipeline import Pipeline

        pd.DataFrame({"k": [1]}).to_parquet(tmp_path / "in.parquet")
        cfg = load_pipeline_yaml(f"""
name: nodep
nodes:
  - name: up
    read: {{path: "{tmp_path}/in.parquet"}}
  - name: down
    depends_on: [up]
    transform:
      - sql: "SELECT * FROM up"
""")
        with pytest.raises(ValueError, match="materialized"):
            Pipeline(cfg, spark).run_node("down")

    def test_run_node_unknown_raises(self, spark, tmp_path):
        from odibi_spark.plans.config import load_pipeline_yaml
        from odibi_spark.plans.pipeline import Pipeline

        cfg = load_pipeline_yaml(self._yaml(tmp_path))
        with pytest.raises(KeyError, match="unknown node"):
            Pipeline(cfg, spark).run_node("nope")

    def test_cli_run_node_and_export(self, spark, tmp_path, capsys):
        from odibi_spark.cli import main

        y = tmp_path / "pipe.yaml"
        y.write_text(self._yaml(tmp_path))
        assert main(["run", str(y), "--node", "bronze"]) == 0
        assert main(["run", str(y), "--node", "silver"]) == 0
        capsys.readouterr()
        assert spark.read.parquet(f"{tmp_path}/silver_out").count() == 3

        out_py = tmp_path / "dag.py"
        assert main([
            "export", "--target", "airflow", "--pipeline", str(y),
            "--out", str(out_py), "--owner", "eng",
        ]) == 0
        code = out_py.read_text()
        compile(code, str(out_py), "exec")
        assert "bronze >> silver" in code
        assert main([
            "export", "--target", "dagster", "--pipeline", str(y),
        ]) == 0
        dag_code = capsys.readouterr().out
        compile(dag_code, "definitions.py", "exec")
        assert "def silver(" in dag_code

    def test_cli_catalog_queries(self, spark, tmp_path, capsys):
        from odibi_spark.catalog import Catalog, run_pipeline_with_catalog
        from odibi_spark.cli import main
        from odibi_spark.plans.config import load_pipeline_yaml
        from odibi_spark.plans.pipeline import Pipeline

        cfg = load_pipeline_yaml(self._yaml(tmp_path))
        cat = Catalog(spark, str(tmp_path / "_system"))
        run_pipeline_with_catalog(Pipeline(cfg, spark), catalog=cat)

        import json as _json

        for what, key in (
            ("runs", "run_id"), ("metrics", "metric"),
            ("daily-stats", "runs"), ("tables", "table_path"),
        ):
            assert main([
                "catalog", what, "--root", str(tmp_path / "_system"),
            ]) == 0
            rows = _json.loads(capsys.readouterr().out)
            assert rows and key in rows[0], (what, rows[:1])
        # pipeline filter
        assert main([
            "catalog", "runs", "--root", str(tmp_path / "_system"),
            "--pipeline", "no_such",
        ]) == 0
        assert _json.loads(capsys.readouterr().out) == []


class TestEnvPropagation:
    """ADVICE r8 #5: a DAG exported from an environments: overlay must
    forward --env into every generated task command, or tasks execute
    the un-overlaid config at runtime."""

    def test_airflow_tasks_carry_env_flag(self, cfg):
        code = render_airflow_dag(cfg, yaml_path="/etc/p.yaml", env="prod")
        compile(code, "dag.py", "exec")
        # one --env per task command, properly placed after --node
        assert code.count("--env prod") == len(cfg.nodes)
        # and absent entirely when no env was given
        assert "--env" not in render_airflow_dag(cfg, yaml_path="/etc/p.yaml")

    def test_dagster_definitions_carry_env(self, cfg):
        code = render_dagster_definitions(
            cfg, yaml_path="/etc/p.yaml", env="prod"
        )
        compile(code, "definitions.py", "exec")
        assert "PIPELINE_ENV = 'prod'" in code
        assert '"--env", PIPELINE_ENV' in code
        none_code = render_dagster_definitions(cfg, yaml_path="/etc/p.yaml")
        compile(none_code, "definitions.py", "exec")
        assert "PIPELINE_ENV = None" in none_code

    def test_cli_export_env_applies_overlay_and_forwards(self, tmp_path, capsys):
        from odibi_spark.cli import main

        y = tmp_path / "pipe.yaml"
        y.write_text(
            "name: envdemo\n"
            "nodes:\n"
            "  - name: bronze\n"
            "    read: {path: /data/dev.parquet}\n"
            "environments:\n"
            "  prod:\n"
            "    nodes:\n"
            "      - name: bronze\n"
            "        read: {path: /data/prod.parquet}\n"
        )
        assert main([
            "export", "--target", "airflow", "--pipeline", str(y),
            "--env", "prod",
        ]) == 0
        code = capsys.readouterr().out
        assert "--env prod" in code


class TestReviewFixes:
    """Round-7 review findings on the exporters (sanitization,
    quoting) and CLI composition."""

    def test_airflow_rejects_invalid_task_id(self):
        from odibi_spark.orchestration import render_airflow_dag
        from odibi_spark.plans.config import load_pipeline_yaml

        cfg = load_pipeline_yaml("""
name: bad
nodes:
  - name: "load data"
    read: {path: "/x.parquet"}
""")
        with pytest.raises(ValueError, match="task id"):
            render_airflow_dag(cfg, yaml_path="p.yaml")

    def test_airflow_quotes_paths_with_spaces(self, cfg):
        from odibi_spark.orchestration import render_airflow_dag

        code = render_airflow_dag(cfg, yaml_path="/my dir/p.yaml")
        compile(code, "dag.py", "exec")
        assert "'/my dir/p.yaml'" in code  # shlex-quoted shell arg

    def test_dagster_sanitizes_dots_and_digits(self):
        from odibi_spark.orchestration import render_dagster_definitions
        from odibi_spark.plans.config import load_pipeline_yaml

        cfg = load_pipeline_yaml("""
name: dots
nodes:
  - name: stage.load
    read: {path: "/x.parquet"}
  - name: 2nd-step
    depends_on: [stage.load]
    transform:
      - sql: "SELECT * FROM `stage.load`"
""")
        code = render_dagster_definitions(cfg, yaml_path="p.yaml")
        compile(code, "definitions.py", "exec")  # was a SyntaxError
        assert "def stage_load(" in code and "def n_2nd_step(" in code
        # the REAL node names still reach _run_node
        assert "'stage.load'" in code and "'2nd-step'" in code

    def test_cli_run_node_with_catalog_records(self, spark, tmp_path, capsys):
        import json as _json

        from odibi_spark.catalog import Catalog
        from odibi_spark.cli import main

        y = tmp_path / "pipe.yaml"
        y.write_text(TestPerNodeRun._yaml(TestPerNodeRun(), tmp_path))
        root = str(tmp_path / "_sys")
        assert main(["run", str(y), "--node", "bronze", "--catalog", root]) == 0
        capsys.readouterr()
        runs = Catalog(spark, root).runs().collect()
        assert len(runs) == 1 and runs[0].node == "bronze"
        m = {r.metric for r in Catalog(spark, root).metrics().collect()}
        assert "rows_written" in m
        # --story with --node is a usage error, not a silent no-op
        assert main([
            "run", str(y), "--node", "bronze", "--story", "/tmp/s.html",
        ]) == 2
