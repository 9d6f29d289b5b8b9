"""Session-based pipeline builder (builder.py + MCP builder actions).

Reference behavior mirrored: odibi_mcp/tools/builder.py — incremental
node assembly, TTL/LRU session eviction, render validated before
returning, session actions excluded from bare stdio.
"""

import pytest

from odibi_spark.builder import BuilderError, PipelineBuilder
from odibi_spark.mcp_server import ActionDenied, ActionEffect, Dispatcher


def _assemble(b):
    sid = b.create("demo")["session_id"]
    b.add_node(sid, "bronze")
    b.configure_read(sid, "bronze", format="parquet", path="/tmp/in")
    b.configure_write(sid, "bronze", path="/tmp/bronze")
    b.add_node(sid, "silver", depends_on=["bronze"])
    b.configure_transform(sid, "silver", [
        {"function": "filter_rows", "params": {"condition": "x > 0"}},
    ])
    b.configure_write(sid, "silver", path="/tmp/silver")
    return sid


class TestBuilderSessions:
    def test_incremental_assembly_and_render(self):
        b = PipelineBuilder()
        sid = _assemble(b)
        state = b.state(sid)
        assert [n["node"]["name"] for n in state["nodes"]] == ["bronze", "silver"]
        assert all(n["missing"] == [] for n in state["nodes"])
        out = b.render_yaml(sid)
        assert out["valid"] is True and out["nodes"] == ["bronze", "silver"]
        # the rendered YAML is loadable standalone
        from odibi_spark.plans.config import load_pipeline_yaml

        cfg = load_pipeline_yaml(out["yaml"])
        assert cfg.nodes[1].transform[0].function == "filter_rows"

    def test_state_reports_missing_pieces(self):
        b = PipelineBuilder()
        sid = b.create("p")["session_id"]
        st = b.add_node(sid, "lonely")
        assert "read or depends_on" in st["missing"]
        assert any("write" in m for m in st["missing"])

    def test_invalid_render_returns_error_not_yaml_run(self):
        b = PipelineBuilder()
        sid = b.create("p")["session_id"]
        b.add_node(sid, "headless")  # no read, no depends_on
        out = b.render_yaml(sid)
        assert out["valid"] is False and "headless" in out["error"]

    def test_guards(self):
        b = PipelineBuilder()
        sid = b.create("p")["session_id"]
        b.add_node(sid, "a")
        with pytest.raises(BuilderError, match="already exists"):
            b.add_node(sid, "a")
        with pytest.raises(BuilderError, match="not a node yet"):
            b.add_node(sid, "b", depends_on=["zzz"])
        with pytest.raises(BuilderError, match="unknown transform"):
            b.configure_transform(sid, "a", [{"function": "no_such_op"}])
        with pytest.raises(BuilderError, match="needs function"):
            b.configure_transform(sid, "a", [{"params": {}}])
        with pytest.raises(BuilderError, match="unknown or expired"):
            b.state("nope")

    def test_ttl_and_lru_eviction(self):
        now = [0.0]
        b = PipelineBuilder(max_sessions=2, ttl_seconds=100, clock=lambda: now[0])
        s1 = b.create("p1")["session_id"]
        now[0] = 50
        s2 = b.create("p2")["session_id"]
        # capacity: creating a third evicts the least-recently-touched (s1)
        s3 = b.create("p3")["session_id"]
        ids = {s["session_id"] for s in b.list_sessions()["sessions"]}
        assert ids == {s2, s3}
        # keep s3 warm, let s2 idle past the TTL
        now[0] = 120
        b.state(s3)  # touch
        now[0] = 160  # s2 idle 110s > 100s TTL; s3 idle 40s
        with pytest.raises(BuilderError):
            b.state(s2)
        assert b.state(s3)["pipeline"] == "p3"

    def test_discard(self):
        b = PipelineBuilder()
        sid = b.create("p")["session_id"]
        assert b.discard(sid)["discarded"] is True
        assert b.discard(sid)["discarded"] is False


class TestBuilderViaMCP:
    def test_bare_stdio_denies_builder(self):
        with pytest.raises(ActionDenied, match="session_mutation"):
            Dispatcher().dispatch("create_pipeline", pipeline_name="x")

    def test_full_agent_flow_renders_and_runs(self, spark, tmp_path):
        """The whole agent loop: session grants -> build node by node
        over the gateway -> render -> execute the rendered YAML."""
        d = Dispatcher(
            spark=spark,
            allow={ActionEffect.SESSION_MUTATION, ActionEffect.EXECUTION},
        )
        sid = d.dispatch("create_pipeline", pipeline_name="agent_built")["session_id"]
        d.dispatch("add_node", session_id=sid, name="nations")
        d.dispatch(
            "configure_read", session_id=sid, node="nations",
            format="parquet", path="/root/testdata/sf0.001/nation.parquet",
        )
        d.dispatch("configure_transform", session_id=sid, node="nations", steps=[
            {"function": "filter_rows", "params": {"condition": "n_regionkey <= 1"}},
        ])
        d.dispatch("configure_validation", session_id=sid, node="nations", tests=[
            {"name": "key_not_null", "type": "not_null", "column": "n_nationkey"},
        ])
        dst = str(tmp_path / "out")
        d.dispatch(
            "configure_write", session_id=sid, node="nations",
            format="parquet", path=dst,
        )
        state = d.dispatch("get_pipeline_state", session_id=sid)
        assert state["nodes"][0]["missing"] == []
        rendered = d.dispatch("render_pipeline_yaml", session_id=sid)
        assert rendered["valid"] is True
        ypath = tmp_path / "built.yaml"
        ypath.write_text(rendered["yaml"])
        run = d.dispatch("run_pipeline", path=str(ypath))
        assert run["results"]["nations"]["status"] == "success"
        assert spark.read.parquet(dst).count() == run["results"]["nations"]["rows_written"]
