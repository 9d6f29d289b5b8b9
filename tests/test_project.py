"""Multi-pipeline projects + cross-pipeline references (reference:
ProjectConfig config.py:5696, cross-pipeline cycles graph.py:159-219)."""

import pandas as pd
import pytest

from odibi_spark.plans.project import Project, load_project_yaml


@pytest.fixture()
def src(tmp_path):
    pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}).to_parquet(
        tmp_path / "in.parquet"
    )
    return tmp_path


class TestProject:
    def test_cross_pipeline_dependency(self, spark, src):
        cfg = load_project_yaml(f"""
name: proj
pipelines:
  - name: bronze
    nodes:
      - name: raw
        read: {{path: "{src}/in.parquet"}}
  - name: gold
    nodes:
      - name: agg
        depends_on: [bronze.raw]
        transform:
          - sql: "SELECT COUNT(*) AS n, SUM(v) AS total FROM df"
        write: {{path: "{src}/gold_agg"}}
""")
        proj = Project(cfg, spark)
        assert proj.plan() == ["bronze", "gold"]
        results = proj.run()
        assert results["gold"]["agg"].status == "success", results["gold"]["agg"].error
        row = spark.read.parquet(f"{src}/gold_agg").collect()[0]
        assert row.n == 3 and row.total == 60.0

    def test_cycle_detected(self, spark, src):
        cfg = load_project_yaml(f"""
name: cyc
pipelines:
  - name: a
    nodes:
      - name: n1
        depends_on: [b.n2]
  - name: b
    nodes:
      - name: n2
        depends_on: [a.n1]
""")
        with pytest.raises(ValueError, match="cycle"):
            Project(cfg, spark)

    def test_unknown_reference_rejected(self, spark, src):
        cfg = load_project_yaml(f"""
name: bad
pipelines:
  - name: a
    nodes:
      - name: n1
        depends_on: [nope.x]
""")
        with pytest.raises(ValueError, match="unknown pipeline 'nope'"):
            Project(cfg, spark)

    def test_failed_upstream_pipeline_skips_downstream(self, spark, src):
        cfg = load_project_yaml(f"""
name: proj2
pipelines:
  - name: up
    nodes:
      - name: raw
        read: {{path: "{src}/does_not_exist.parquet"}}
  - name: down
    nodes:
      - name: agg
        depends_on: [up.raw]
        transform:
          - sql: "SELECT COUNT(*) AS n FROM df"
""")
        results = Project(cfg, spark).run()
        assert results["up"]["raw"].status == "failed"
        assert results["down"]["agg"].status == "skipped"
        assert "upstream pipeline failed" in results["down"]["agg"].error

    def test_project_level_connections_inherited(self, spark, src):
        cfg = load_project_yaml(f"""
name: proj3
connections:
  lake: {{type: local, base_path: "{src}"}}
pipelines:
  - name: p
    nodes:
      - name: n
        read: {{path: in.parquet, connection: lake}}
        write: {{path: out_conn, connection: lake}}
""")
        results = Project(cfg, spark).run()
        assert results["p"]["n"].status == "success", results["p"]["n"].error
        assert spark.read.parquet(f"{src}/out_conn").count() == 3


class TestProjectCli:
    def test_validate_plan_graph(self, tmp_path, capsys):
        from odibi_spark.cli import main

        y = tmp_path / "proj.yaml"
        y.write_text("""
name: proj
pipelines:
  - name: a
    nodes:
      - name: n1
        read: {path: /x.parquet}
  - name: b
    nodes:
      - name: n2
        depends_on: [a.n1]
""")
        assert main(["validate", str(y)]) == 0
        assert "2 pipelines, 2 nodes" in capsys.readouterr().out
        assert main(["plan", str(y)]) == 0
        out = capsys.readouterr().out
        assert "stage 0: a" in out and "stage 1: b" in out
        assert main(["graph", str(y)]) == 0
        assert "b.n2 <- a.n1" in capsys.readouterr().out
