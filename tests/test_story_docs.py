"""DocGenerator (story_docs.py) — markdown docs, aggregation state, history.

Reference behavior mirrored: odibi/story/doc_generator.py — project docs
only on success, RUN_HISTORY always (newest first), .pipelines.json shared
across pipelines.
"""

import json
from pathlib import Path

import pytest

from odibi_spark.plans.config import PipelineConfig
from odibi_spark.plans.node import NodeResult
from odibi_spark.story_docs import DocGenerator, DocsConfig
from odibi_spark.validation.engine import TestResult


def _pipeline(name="sales"):
    return PipelineConfig(
        name=name,
        nodes=[
            {
                "name": "bronze",
                "read": {"format": "parquet", "path": "/data/in"},
                "write": {"format": "parquet", "path": "/data/bronze", "mode": "overwrite"},
            },
            {
                "name": "silver",
                "depends_on": ["bronze"],
                "transform": [
                    {"function": "filter_rows", "params": {"condition": "x > 0"}},
                    {"sql": "SELECT * FROM silver"},
                ],
                "write": {"format": "parquet", "path": "/data/silver", "mode": "overwrite"},
            },
        ],
    )


def _ok_results():
    return {
        "bronze": NodeResult(name="bronze", status="success", rows_written=100, duration_s=1.5),
        "silver": NodeResult(
            name="silver",
            status="success",
            rows_written=90,
            duration_s=0.5,
            validation=[
                TestResult("x_not_null", "not_null", 0, 90, 0.0, True, False),
                TestResult("x_range", "range", 3, 90, 0.05, True, False),
            ],
        ),
    }


def _gen(tmp_path, **cfg):
    return DocGenerator(DocsConfig(project="Test Project", **cfg), workspace_root=str(tmp_path))


def test_success_run_writes_all_artifacts(tmp_path):
    out = _gen(tmp_path).generate(_pipeline(), _ok_results(), story_html_path="stories/run.html")
    root = tmp_path / "docs/generated"
    assert set(out) == {
        "readme", "technical_details", "node_card:bronze", "node_card:silver", "run_history",
    }
    readme = (root / "README.md").read_text()
    assert "# Test Project" in readme
    assert "| sales | ✅ success | 2 | 190 |" in readme
    tech = (root / "TECHNICAL_DETAILS.md").read_text()
    assert "```mermaid" in tech and "bronze --> silver" in tech
    assert "filter_rows, sql" in tech
    assert "2/2 pass" in tech
    card = (root / "node_cards/sales/silver.md").read_text()
    assert "1. `filter_rows` — condition='x > 0'" in card
    assert "| x_not_null | not_null | 0 | 90 | ✓ |" in card
    hist = (root / "RUN_HISTORY.md").read_text()
    assert "✅ success (2 ok, 0 failed, 0 skipped)" in hist
    assert "[Story](stories/run.html)" in hist
    state = json.loads((root / ".pipelines.json").read_text())
    assert state["pipelines"]["sales"]["rows_written"] == 190
    assert state["pipelines"]["sales"]["failed_nodes"] == 0


def test_failed_run_skips_project_docs_but_records_history(tmp_path):
    gen = _gen(tmp_path)
    gen.generate(_pipeline(), _ok_results())
    root = tmp_path / "docs/generated"
    readme_before = (root / "README.md").read_text()

    bad = _ok_results()
    bad["silver"] = NodeResult(name="silver", status="failed", error="boom: column missing")
    out = gen.generate(_pipeline(), bad)
    assert set(out) == {"run_history"}
    assert (root / "README.md").read_text() == readme_before  # untouched
    hist = (root / "RUN_HISTORY.md").read_text()
    # newest first: failed memo appears before the earlier success memo
    assert hist.index("❌ FAILED") < hist.index("✅ success")
    assert "`silver`: boom: column missing" in hist
    state = json.loads((root / ".pipelines.json").read_text())
    assert state["pipelines"]["sales"]["status"] == "failed"


def test_multiple_pipelines_aggregate_in_readme(tmp_path):
    gen = _gen(tmp_path)
    gen.generate(_pipeline("sales"), _ok_results())
    gen.generate(_pipeline("hr"), _ok_results())
    readme = (tmp_path / "docs/generated/README.md").read_text()
    assert "| hr | ✅ success" in readme and "| sales | ✅ success" in readme
    state = json.loads((tmp_path / "docs/generated/.pipelines.json").read_text())
    assert set(state["pipelines"]) == {"sales", "hr"}


def test_history_capped_at_max(tmp_path):
    gen = _gen(tmp_path, max_history=3)
    for _ in range(5):
        gen.generate(_pipeline(), _ok_results())
    hist = (tmp_path / "docs/generated/RUN_HISTORY.md").read_text()
    assert hist.count("## sales —") == 3
    assert hist.startswith("# Run history")


def test_write_callback_seam(tmp_path):
    captured = {}
    gen = DocGenerator(
        DocsConfig(output_path=str(tmp_path / "out")),
        write_file=lambda p, c: captured.__setitem__(p, c),
        read_file=lambda p: captured.get(p),
    )
    out = gen.generate(_pipeline(), _ok_results())
    assert not (tmp_path / "out").exists()  # nothing hit the real filesystem
    assert any(p.endswith("README.md") for p in captured)
    assert set(out) >= {"readme", "run_history"}


def test_corrupt_state_recovers(tmp_path):
    root = tmp_path / "docs/generated"
    root.mkdir(parents=True)
    (root / ".pipelines.json").write_text("{not json")
    out = _gen(tmp_path).generate(_pipeline(), _ok_results())
    assert "readme" in out
    state = json.loads((root / ".pipelines.json").read_text())
    assert "sales" in state["pipelines"]


def test_disabled_is_noop(tmp_path):
    out = _gen(tmp_path, enabled=False).generate(_pipeline(), _ok_results())
    assert out == {}
    assert not (tmp_path / "docs/generated").exists()


class TestYamlDocsSurface:
    """story: + docs: blocks in the pipeline YAML drive generation from
    the CLI run verb (reference: odibi/config.py:5343 story.docs)."""

    def test_cli_run_generates_story_and_docs(self, spark, tmp_path, capsys):
        from odibi_spark.cli import main

        y = tmp_path / "p.yaml"
        y.write_text(f"""
name: docs_demo
story:
  path: {tmp_path}/story.html
  sample_rows: 3
  docs:
    output_path: {tmp_path}/docs
    project: Docs Demo
    outputs: {{technical_details: false}}
nodes:
  - name: nations
    read: {{format: parquet, path: /root/testdata/sf0.001/nation.parquet}}
    write: {{format: parquet, path: {tmp_path}/out, mode: overwrite}}
""")
        assert main(["run", str(y)]) == 0
        out = capsys.readouterr().out
        assert "story:" in out and "docs:" in out
        assert (tmp_path / "story.html").exists()
        assert (tmp_path / "docs/README.md").exists()
        assert not (tmp_path / "docs/TECHNICAL_DETAILS.md").exists()  # disabled
        card = (tmp_path / "docs/node_cards/docs_demo/nations.md").read_text()
        assert "## Output schema" in card and "n_nationkey" in card
        assert (tmp_path / "docs/RUN_HISTORY.md").exists()
        readme = (tmp_path / "docs/README.md").read_text()
        assert "# Docs Demo" in readme

    def test_story_config_rejects_unknown_keys(self):
        from odibi_spark.plans.config import PipelineConfig

        with pytest.raises(Exception, match="bogus"):
            PipelineConfig(
                name="x",
                story={"bogus": 1},
                nodes=[{"name": "a", "read": {"path": "/tmp/x"}}],
            )
