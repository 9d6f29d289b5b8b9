"""MCP stdio server (mcp_server.py) — dispatcher, access posture, transport.

Reference behavior mirrored: odibi_mcp/ — 2-tool universal gateway
(odibi_execute/odibi_help), action→effect classification with stdio
granting public reads only, JSON-RPC 2.0 stdio transport.
"""

import io
import json
import subprocess
import sys

import pytest

SF_SMALL = "/root/testdata/sf0.001"

from odibi_spark.mcp_server import (
    ActionDenied,
    ActionEffect,
    Dispatcher,
    MCPServer,
)

PIPELINE_YAML = """
name: demo
nodes:
  - name: bronze
    read: {format: parquet, path: /tmp/in}
  - name: silver
    depends_on: [bronze]
    transform:
      - {function: filter_rows, params: {condition: "1 = 1"}}
"""


# -- dispatcher: public reads (spark-free) ----------------------------------


def test_help_catalog_lists_all_actions():
    d = Dispatcher()
    h = d.help()
    names = {r["action"] for r in h["actions"]}
    assert {"list_workloads", "validate_yaml", "run_pipeline",
            "profile_source", "scaffold_pipeline"} <= names
    assert "workloads" in h["categories"]
    # effect classification surfaces in help
    by_name = {r["action"]: r for r in h["actions"]}
    assert by_name["list_workloads"]["effect"] == "public_read"
    assert by_name["run_pipeline"]["effect"] == "execution"
    assert by_name["run_pipeline"]["allowed"] is False


def test_help_single_action_detail():
    h = Dispatcher().help(action="validate_yaml")
    assert h["action"] == "validate_yaml"
    assert "yaml" in h["doc"].lower()


def test_list_workloads_matches_declared_queries():
    from odibi_spark.workloads import QUERIES

    out = Dispatcher().dispatch("list_workloads")
    assert out["count"] == len(QUERIES)
    assert set(out["workloads"]) == set(QUERIES)


def test_workload_oracle_sql_roundtrip():
    out = Dispatcher().dispatch("workload_oracle_sql", name="q6_forecast_revenue")
    assert out["has_oracle"] and "lineitem" in out["oracle_sql"].lower()


def test_validate_yaml_good_and_bad():
    d = Dispatcher()
    ok = d.dispatch("validate_yaml", yaml_text=PIPELINE_YAML)
    assert ok == {"valid": True, "pipeline": "demo", "nodes": ["bronze", "silver"]}
    bad = d.dispatch("validate_yaml", yaml_text="name: x\nnodes:\n  - name: solo\n")
    assert bad["valid"] is False and "solo" in bad["error"]


def test_plan_and_lineage():
    d = Dispatcher()
    plan = d.dispatch("plan_pipeline", yaml_text=PIPELINE_YAML)
    assert plan["layers"] == [["bronze"], ["silver"]]
    lin = d.dispatch("lineage_graph", yaml_text=PIPELINE_YAML)
    assert [n["name"] for n in lin["nodes"]] == ["bronze", "silver"]
    assert lin["nodes"][1]["transforms"] == ["filter_rows"]


def test_transformer_catalog():
    d = Dispatcher()
    names = d.dispatch("list_transformers")["transformers"]
    assert "filter_rows" in names
    detail = d.dispatch("explain_transformer", name="filter_rows")
    assert "condition" in detail["signature"] or "condition" in detail["doc"]


def test_scaffold_yaml_is_loadable():
    d = Dispatcher()
    y = d.dispatch("scaffold_pipeline", name="p1", source_path="/a", target_path="/b")
    assert d.dispatch("validate_yaml", yaml_text=y["yaml"])["valid"] is True


# -- access posture ---------------------------------------------------------


def test_default_transport_denies_sensitive_and_execution(tmp_path):
    d = Dispatcher()
    with pytest.raises(ActionDenied):
        d.dispatch("profile_source", dataset=str(tmp_path))
    with pytest.raises(ActionDenied):
        d.dispatch("run_pipeline", path="whatever.yaml")


def test_grants_unlock_effect_classes(tmp_path, spark):
    import pyspark.sql.functions as F

    p = str(tmp_path / "d.parquet")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(p)
    d = Dispatcher(spark=spark, allow={ActionEffect.SENSITIVE_READ})
    prof = d.dispatch("profile_source", dataset=p)
    assert prof["row_count"] == 10
    sch = d.dispatch("get_schema", dataset=p)
    assert {c["name"] for c in sch["columns"]} == {"id", "v"}
    with pytest.raises(ActionDenied):
        d.dispatch("run_pipeline", path="x.yaml")  # execution still gated


def test_unknown_action_lists_known():
    with pytest.raises(KeyError, match="list_workloads"):
        Dispatcher().dispatch("nope")


# -- spark-backed actions ---------------------------------------------------


def test_run_and_explain_workload(spark):
    sf_dir = SF_SMALL
    d = Dispatcher(
        spark=spark,
        allow={ActionEffect.EXECUTION, ActionEffect.SENSITIVE_READ},
    )
    out = d.dispatch("run_workload", name="q6_forecast_revenue", sf_dir=sf_dir, limit=5)
    assert out["rows"] and "revenue" in {c.lower() for c in out["columns"]}
    plan = d.dispatch("explain_workload", name="q6_forecast_revenue", sf_dir=sf_dir)
    assert "Physical Plan" in plan["plan"]


def test_run_pipeline_end_to_end(spark, tmp_path):
    sf_dir = SF_SMALL
    src = f"{sf_dir}/nation.parquet"
    dst = str(tmp_path / "out")
    yaml_text = f"""
name: mcp_e2e
nodes:
  - name: nations
    read: {{format: parquet, path: {src}}}
    transform:
      - {{function: filter_rows, params: {{condition: "n_regionkey = 0"}}}}
    write: {{format: parquet, path: {dst}, mode: overwrite}}
"""
    ypath = tmp_path / "p.yaml"
    ypath.write_text(yaml_text)
    d = Dispatcher(spark=spark, allow={ActionEffect.EXECUTION})
    out = d.dispatch("run_pipeline", path=str(ypath))
    assert out["results"]["nations"]["status"] == "success"
    assert spark.read.parquet(dst).count() == out["results"]["nations"]["rows_written"]


# -- MCP transport ----------------------------------------------------------


def _rpc(server, method, msg_id=None, **params):
    return server.handle(
        {"jsonrpc": "2.0", "id": msg_id, "method": method, "params": params}
    )


def test_protocol_handshake_and_tool_list():
    s = MCPServer(Dispatcher())
    init = _rpc(s, "initialize", msg_id=1)
    assert init["result"]["serverInfo"]["name"] == "odibi-spark"
    assert _rpc(s, "notifications/initialized") is None
    tools = _rpc(s, "tools/list", msg_id=2)["result"]["tools"]
    assert {t["name"] for t in tools} == {"odibi_execute", "odibi_help"}
    assert _rpc(s, "ping", msg_id=3)["result"] == {}
    err = _rpc(s, "resources/list", msg_id=4)
    assert err["error"]["code"] == -32601


def test_tools_call_execute_and_error_shapes():
    s = MCPServer(Dispatcher())
    ok = _rpc(s, "tools/call", msg_id=5, name="odibi_execute",
              arguments={"action": "list_workloads"})
    body = json.loads(ok["result"]["content"][0]["text"])
    assert body["count"] > 100 and ok["result"]["isError"] is False
    # denied action → isError content, not a protocol error
    denied = _rpc(s, "tools/call", msg_id=6, name="odibi_execute",
                  arguments={"action": "run_pipeline",
                             "args_json": json.dumps({"path": "x"})})
    dbody = json.loads(denied["result"]["content"][0]["text"])
    assert denied["result"]["isError"] is True and dbody["code"] == "ACTION_DENIED"
    # bad args_json → isError with message
    bad = _rpc(s, "tools/call", msg_id=7, name="odibi_execute",
               arguments={"action": "list_workloads", "args_json": "[1,2]"})
    assert bad["result"]["isError"] is True


def test_serve_loop_over_buffers():
    lines = "\n".join(
        json.dumps(m)
        for m in [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            "not json at all",
            {"jsonrpc": "2.0", "id": 2, "method": "tools/call",
             "params": {"name": "odibi_help", "arguments": {"category": "validation"}}},
        ]
        if isinstance(m, dict)
    ) + "\nnot json at all\n"
    out = io.StringIO()
    MCPServer(Dispatcher(), inp=io.StringIO(lines), out=out).serve()
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    by_id = {r.get("id"): r for r in resps}
    assert by_id[1]["result"]["protocolVersion"]
    assert by_id[None]["error"]["code"] == -32700  # parse error didn't kill loop
    help_body = json.loads(by_id[2]["result"]["content"][0]["text"])
    assert all(r["category"] == "validation" for r in help_body["actions"])


def test_stdio_subprocess_handshake():
    """Real `python -m odibi_spark.mcp_server` process, newline JSON-RPC."""
    proc = subprocess.Popen(
        [sys.executable, "-m", "odibi_spark.mcp_server"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
    )
    try:
        msgs = [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/call",
             "params": {"name": "odibi_execute",
                        "arguments": {"action": "list_transformers"}}},
        ]
        out, _ = proc.communicate(
            "".join(json.dumps(m) + "\n" for m in msgs), timeout=120
        )
        resps = [json.loads(l) for l in out.splitlines()]
        assert resps[0]["id"] == 1 and "serverInfo" in resps[0]["result"]
        body = json.loads(resps[1]["result"]["content"][0]["text"])
        assert "filter_rows" in body["transformers"]
    finally:
        proc.kill()


class TestOnboardingDocs:
    def test_list_get_search(self):
        d = Dispatcher()
        docs = d.dispatch("list_docs")["docs"]
        assert "README.md" in docs and "SURVEY.md" in docs
        doc = d.dispatch("get_doc", name="README.md", max_chars=500)
        assert doc["text"].startswith("# odibi_spark") and doc["truncated"]
        bad = d.dispatch("get_doc", name="nope.md")
        assert "unknown doc" in bad["error"]
        # display text is truncated to 200 chars; the MATCH is on the
        # full line, so assert on doc/line presence instead
        hits = d.dispatch("search_docs", query="webdataset", limit=5)
        assert hits["hits"] and {h["doc"] for h in hits["hits"]} & {
            "README.md", "SURVEY.md", "COVERAGE.md",
        }
        none = d.dispatch("search_docs", query="zzz-not-a-real-token")
        assert none["hits"] == [] and none["capped"] is False


class TestTaskGuidance:
    def test_list_and_get(self):
        d = Dispatcher()
        types = d.dispatch("list_task_types")["task_types"]
        assert {"profile_data", "curate_training_data", "dedup_corpus"} <= {
            t["task_type"] for t in types
        }
        g = d.dispatch("get_task_guidance", task_type="build_pipeline")
        assert g["next_tool"] == "scaffold_pipeline"
        assert any(q["param"] == "name" for q in g["questions"])
        bad = d.dispatch("get_task_guidance", task_type="nope")
        assert "unknown task_type" in bad["error"]

    def test_guidance_never_drifts_from_registry(self):
        """Every next_tool / discover_with in TASK_GUIDANCE must be a
        real dispatcher action, every call_template placeholder a
        declared question param, and option-values naming transforms
        must exist in the function registry."""
        import re

        import odibi_spark.llm.transforms  # noqa: F401 - registers
        import odibi_spark.operators  # noqa: F401

        from odibi_spark.guidance import TASK_GUIDANCE
        from odibi_spark.registry import get_registry

        actions = set(Dispatcher()._actions)
        registry = set(get_registry().list())
        for task, g in TASK_GUIDANCE.items():
            assert g["next_tool"] in actions, (task, g["next_tool"])
            params = {q["param"] for q in g["questions"]}
            for q in g["questions"]:
                if "discover_with" in q:
                    assert q["discover_with"] in actions, (task, q)
            for ph in re.findall(r"\{(\w+)\}", g["call_template"]):
                assert ph in params, (task, ph)
            if task == "dedup_corpus":
                for opt in g["questions"][0]["options"]:
                    assert opt["value"] in registry, opt


class TestConstructionPatterns:
    def test_list_patterns_and_template(self):
        d = Dispatcher()
        pats = d.dispatch("list_patterns")["patterns"]
        assert set(pats) == {
            "scd2", "merge", "dimension", "fact", "date_dimension",
            "aggregation_incremental", "delete_detection", "snapshot_cdc",
        }
        t = d.dispatch("apply_pattern_template", type="scd2")
        assert "type: scd2" in t["yaml"]
        assert "target_path: <str>   # required" in t["yaml"]
        assert "# valid_from_col: 'valid_from'" in t["yaml"]

    def test_every_pattern_template_renders(self):
        d = Dispatcher()
        for ptype in d.dispatch("list_patterns")["patterns"]:
            y = d.dispatch("apply_pattern_template", type=ptype)["yaml"]
            assert f"type: {ptype}" in y

    def test_suggest_pipeline_is_profile_aware_and_runnable(self, spark, tmp_path):
        d = Dispatcher(
            spark=spark,
            allow={ActionEffect.SENSITIVE_READ, ActionEffect.EXECUTION},
        )
        out = d.dispatch(
            "suggest_pipeline", name="nation_load",
            source_path="/root/testdata/sf0.001/nation.parquet",
            target_path=str(tmp_path / "out"),
        )
        y = out["yaml"]
        assert "n_nationkey_unique" in y and "volume_floor" in y
        ypath = tmp_path / "suggested.yaml"
        ypath.write_text(y)
        run = d.dispatch("run_pipeline", path=str(ypath))
        assert run["results"]["load"]["status"] == "success"
        assert run["results"]["load"]["rows_written"] == 25


def test_onboarding_examples():
    d = Dispatcher()
    ex = d.dispatch("list_examples")["examples"]
    names = {e["name"] for e in ex}
    assert "training_data_prep.yaml" in names
    got = d.dispatch("get_example", name="training_data_prep.yaml")
    assert "neardup_decontaminate" in got["yaml"]
    assert "error" in d.dispatch("get_example", name="nope.yaml")
    assert "error" in d.dispatch("get_example", name="../SURVEY.md")


class TestSemanticActions:
    MODEL = {
        "source": "orders_src",
        "metrics": {
            "revenue": {"expr": "sum(o_totalprice)"},
            "orders": {"expr": "count(*)"},
            "aov": {"formula": "revenue / orders"},
        },
        "dimensions": {"status": {"column": "o_orderstatus"}},
    }

    def test_semantic_sql_is_public_and_pure(self):
        out = Dispatcher().dispatch(
            "semantic_sql", model=self.MODEL, query="revenue, aov BY status"
        )
        sql = out["sql"].lower()
        assert "group by" in sql and "sum(o_totalprice)" in sql
        assert "nullif" in sql  # derived-metric divisor guard

    def test_semantic_query_executes_against_a_path(self, spark):
        import duckdb

        d = Dispatcher(spark=spark, allow={ActionEffect.EXECUTION})
        out = d.dispatch(
            "semantic_query", model=self.MODEL,
            query="revenue, orders BY status",
            source_path=f"{SF_SMALL}/orders.parquet",
        )
        got = {r["status"]: (round(r["revenue"], 2), r["orders"]) for r in out["rows"]}
        exp = {
            s: (round(float(rv), 2), n)
            for s, rv, n in duckdb.sql(
                f"SELECT o_orderstatus, sum(o_totalprice), count(*) "
                f"FROM read_parquet('{SF_SMALL}/orders.parquet') GROUP BY 1"
            ).fetchall()
        }
        assert got == exp


def test_cli_mcp_verb_serves_stdio():
    proc = subprocess.Popen(
        [sys.executable, "-m", "odibi_spark.cli", "mcp"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
    )
    try:
        out, _ = proc.communicate(
            json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                        "params": {}}) + "\n",
            timeout=120,
        )
        assert json.loads(out.splitlines()[0])["result"]["serverInfo"]["name"] == "odibi-spark"
    finally:
        proc.kill()
