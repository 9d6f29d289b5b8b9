"""MCP (Model Context Protocol) stdio server — the agent-facing gateway.

Reference parity: ``odibi_mcp/`` — a FastMCP server exposing the engine
through the 2-tool universal-dispatcher pattern (``odibi_mcp/mcp_server.py``
tools ``odibi_execute``/``odibi_help``; ``odibi_mcp/dispatcher.py``
action→effect classification; ``contracts/access``: stdio carries no HTTP
identity, so it exposes only actions classified as public reads unless the
embedder explicitly grants more). FastMCP is not a dependency here: the MCP
stdio transport is public protocol — newline-delimited JSON-RPC 2.0 with
``initialize`` / ``tools/list`` / ``tools/call`` — so this twin speaks it
directly from the stdlib.

Actions map onto surface this repo already has (connections discovery,
plans loader/graph/lineage, registry, workloads, catalog, scaffold); the
dispatcher adds no second implementation of anything. Spark-backed actions
build a session lazily on first use; everything classified PUBLIC_READ is
Spark-free so the common agent loop (help → validate → lineage) costs no JVM.

Usage::

    python -m odibi_spark.mcp_server                  # public reads only
    python -m odibi_spark.mcp_server --allow sensitive,execution
"""

from __future__ import annotations

import json
import sys
import traceback
from enum import Enum
from typing import Any, Callable


class ActionEffect(str, Enum):
    """Reference access posture (odibi_mcp/contracts/access — dispatcher.py
    ACTION_EFFECTS): public reads are always safe; sensitive reads touch
    user data; execution mutates the world."""

    PUBLIC_READ = "public_read"
    SENSITIVE_READ = "sensitive_read"
    SESSION_MUTATION = "session_mutation"   # in-memory builder state only
    EXECUTION = "execution"


class ActionDenied(Exception):
    pass


# ---------------------------------------------------------------------------
# dispatcher


class Dispatcher:
    """Universal action dispatcher (reference odibi_mcp/dispatcher.py —
    37 actions compressed behind one ``dispatch`` surface).

    ``allow`` grants effect classes beyond PUBLIC_READ; a bare stdio
    transport grants none (reference: stdio has no HTTP identity).
    """

    def __init__(self, *, spark=None, allow: set[ActionEffect] | None = None):
        self._spark = spark
        self.allow = {ActionEffect.PUBLIC_READ} | (allow or set())
        self._actions: dict[str, dict[str, Any]] = {}
        self._register_all()

    # -- session ----------------------------------------------------------

    def spark(self):
        if self._spark is None:
            from odibi_spark.session import get_spark

            self._spark = get_spark("odibi_spark_mcp")
        return self._spark

    # -- registry ---------------------------------------------------------

    def _add(
        self,
        name: str,
        category: str,
        effect: ActionEffect,
        fn: Callable[..., Any],
        doc: str,
    ) -> None:
        self._actions[name] = {
            "category": category, "effect": effect, "fn": fn, "doc": doc,
        }

    def dispatch(self, action: str, **kwargs) -> Any:
        meta = self._actions.get(action)
        if meta is None:
            known = sorted(self._actions)
            raise KeyError(f"unknown action '{action}'; known: {known}")
        if meta["effect"] not in self.allow:
            raise ActionDenied(
                f"action '{action}' is classified {meta['effect'].value}; "
                f"this transport grants only "
                f"{sorted(e.value for e in self.allow)} — start the server "
                f"with --allow or embed Dispatcher(allow=...) for more"
            )
        return meta["fn"](**kwargs)

    def help(self, category: str | None = None, action: str | None = None) -> dict:
        if action:
            m = self._actions.get(action)
            if m is None:
                return {"error": f"unknown action '{action}'"}
            return {
                "action": action,
                "category": m["category"],
                "effect": m["effect"].value,
                "doc": m["doc"],
                "allowed": m["effect"] in self.allow,
            }
        rows = [
            {
                "action": name,
                "category": m["category"],
                "effect": m["effect"].value,
                "allowed": m["effect"] in self.allow,
                "doc": m["doc"].splitlines()[0],
            }
            for name, m in sorted(self._actions.items())
            if category is None or m["category"] == category
        ]
        return {"actions": rows, "categories": sorted({m["category"] for m in self._actions.values()})}

    # -- actions ----------------------------------------------------------

    def _register_all(self) -> None:
        A = self._add
        P, S, X = ActionEffect.PUBLIC_READ, ActionEffect.SENSITIVE_READ, ActionEffect.EXECUTION
        M = ActionEffect.SESSION_MUTATION

        # Workloads (reference category: Workflows)
        A("list_workloads", "workloads", P, self._list_workloads,
          "List every declared workload query name.")
        A("workload_oracle_sql", "workloads", P, self._workload_oracle_sql,
          "Return the ANSI-SQL oracle for a workload (args: name).")
        A("run_workload", "workloads", X, self._run_workload,
          "Run a workload and return up to `limit` rows (args: name, sf_dir, limit=20).")
        A("explain_workload", "workloads", S, self._explain_workload,
          "Return the formatted physical plan for a workload (args: name, sf_dir).")

        # Discovery (reference: map_environment / profile_source / profile_folder)
        A("discover", "discovery", S, self._discover,
          "List datasets under a base path (args: base_path, pattern='*', limit=200).")
        A("get_schema", "discovery", S, self._get_schema,
          "Schema of a dataset file/dir (args: dataset).")
        A("preview", "discovery", S, self._preview,
          "Sample rows from a dataset (args: dataset, rows=5).")
        A("profile_source", "discovery", S, self._profile,
          "Row count + per-column stats for a dataset (args: dataset).")

        # Construction (reference: list_transformers / templates / suggest)
        A("list_transformers", "construction", P, self._list_transformers,
          "List registered transform functions.")
        A("explain_transformer", "construction", P, self._explain_transformer,
          "Docstring + signature of a transform (args: name).")
        A("scaffold_pipeline", "construction", P, self._scaffold,
          "Render a starter pipeline YAML (args: name, source_path, target_path).")
        A("pipeline_json_schema", "construction", P, self._json_schema,
          "JSON Schema for the pipeline YAML config.")
        A("list_patterns", "construction", P, self._list_patterns,
          "Warehouse pattern types with a one-line description.")
        A("apply_pattern_template", "construction", P, self._pattern_template,
          "Starter YAML node for a warehouse pattern (args: type).")
        A("suggest_pipeline", "construction", S, self._suggest_pipeline,
          "Profile a source and generate a pipeline YAML with data-aware "
          "validation tests (args: name, source_path, target_path).")

        # Validation / inspection
        A("validate_yaml", "validation", P, self._validate_yaml,
          "Validate a pipeline YAML (args: yaml_text or path; optional env).")
        A("plan_pipeline", "validation", P, self._plan,
          "Topological execution layers for a pipeline (args: yaml_text or path).")
        A("lineage_graph", "validation", P, self._lineage,
          "Lineage facets for a pipeline (args: yaml_text or path).")
        A("doctor", "validation", S, self._doctor,
          "Environment diagnostics (args: optional pipeline path).")

        # Execution
        A("run_pipeline", "execution", X, self._run_pipeline,
          "Execute a pipeline YAML end-to-end (args: path, env=None).")
        A("run_node", "execution", X, self._run_node,
          "Execute one node of a pipeline (args: path, node, env=None).")

        # Semantic layer (reference Download category: download_sql renders
        # the SQL a semantic request compiles to; execution variant runs it)
        A("semantic_sql", "semantics", P, self._semantic_sql,
          "Compile a 'metrics BY dims WHERE ...' request to SQL without "
          "running it (args: model, query).")
        A("semantic_query", "semantics", X, self._semantic_query,
          "Register source_path as the model source and execute the "
          "semantic request (args: model, query, source_path, limit=100).")

        # Session builder (reference: create_pipeline ... discard_pipeline —
        # incremental YAML assembly; mutates in-process session state only,
        # so it gets its own effect class, excluded from bare stdio like
        # the reference's SESSION_MUTATION actions)
        A("create_pipeline", "builder", M, self._b("create", "pipeline_name"),
          "Start a builder session (args: pipeline_name).")
        A("add_node", "builder", M, self._b("add_node", "session_id", "name", "depends_on"),
          "Add a node (args: session_id, name, depends_on=[]).")
        A("configure_read", "builder", M, self._b_kw("configure_read"),
          "Set a node's read (args: session_id, node, format, path/table, ...).")
        A("configure_transform", "builder", M, self._b("configure_transform", "session_id", "node", "steps"),
          "Append transform steps (args: session_id, node, steps=[{function,params}|{sql}]).")
        A("configure_write", "builder", M, self._b_kw("configure_write"),
          "Set a node's write (args: session_id, node, format, path, mode, ...).")
        A("configure_validation", "builder", M, self._b("configure_validation", "session_id", "node", "tests"),
          "Set a node's validation tests (args: session_id, node, tests).")
        A("get_pipeline_state", "builder", M, self._b("state", "session_id"),
          "Inspect a session's nodes + what each still needs.")
        A("render_pipeline_yaml", "builder", M, self._b("render_yaml", "session_id"),
          "Serialize + strict-validate the session; returns yaml or the error.")
        A("list_sessions", "builder", M, self._b("list_sessions"),
          "List active builder sessions.")
        A("discard_pipeline", "builder", M, self._b("discard", "session_id"),
          "Drop a builder session.")

        # Task guidance (reference: get_task_guidance / list_task_types)
        A("list_task_types", "guidance", P, self._list_task_types,
          "List guided task types with descriptions.")
        A("get_task_guidance", "guidance", P, self._get_task_guidance,
          "Structured questions + call template for a task (args: task_type).")

        # Onboarding (reference: list_docs / get_doc / search_docs)
        A("list_docs", "onboarding", P, self._list_docs,
          "List the repo's markdown docs.")
        A("get_doc", "onboarding", P, self._get_doc,
          "Return one doc's text (args: name; optional max_chars=20000).")
        A("search_docs", "onboarding", P, self._search_docs,
          "Case-insensitive substring search over docs (args: query, limit=20).")
        A("list_examples", "onboarding", P, self._list_examples,
          "List runnable example pipeline YAMLs with their headline comment.")
        A("get_example", "onboarding", P, self._get_example,
          "Return one example YAML's text (args: name).")

        # Catalog (reference: story_read / run inspection)
        A("catalog_runs", "catalog", S, self._catalog_runs,
          "Recent meta_runs rows (args: root, pipeline=None, limit=20).")
        A("catalog_health", "catalog", S, self._catalog_health,
          "Per-pipeline 7d/30d health rollup (args: root).")
        A("catalog_tables", "catalog", S, self._catalog_tables,
          "Registered tables in the catalog (args: root).")

    # workloads ----------------------------------------------------------

    def _list_workloads(self) -> dict:
        from odibi_spark.workloads import QUERIES

        return {"workloads": sorted(QUERIES), "count": len(QUERIES)}

    def _workload_oracle_sql(self, name: str) -> dict:
        from odibi_spark.workloads import ORACLES

        sql = ORACLES.get(name)
        return {"name": name, "oracle_sql": sql, "has_oracle": sql is not None}

    def _run_workload(self, name: str, sf_dir: str, limit: int = 20) -> dict:
        from odibi_spark.workloads import QUERIES

        df = QUERIES[name](self.spark(), sf_dir)
        rows = [r.asDict(recursive=True) for r in df.limit(int(limit)).collect()]
        return {"name": name, "columns": df.columns, "rows": rows}

    def _explain_workload(self, name: str, sf_dir: str) -> dict:
        from odibi_spark.workloads import QUERIES

        df = QUERIES[name](self.spark(), sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        return {"name": name, "plan": plan}

    # discovery ----------------------------------------------------------

    def _conn(self, base: str = "."):
        from odibi_spark.connections import LocalConnection

        return LocalConnection(base)

    def _discover(self, base_path: str, pattern: str = "*", limit: int = 200) -> dict:
        return self._conn(base_path).discover_catalog(pattern=pattern, limit=limit)

    def _get_schema(self, dataset: str) -> dict:
        return self._conn().get_schema(dataset)

    def _preview(self, dataset: str, rows: int = 5) -> dict:
        return self._conn().preview(dataset, rows=int(rows))

    def _profile(self, dataset: str) -> dict:
        return self._conn().profile(dataset)

    # construction -------------------------------------------------------

    def _list_transformers(self) -> dict:
        from odibi_spark.registry import get_registry

        return {"transformers": sorted(get_registry().list())}

    def _explain_transformer(self, name: str) -> dict:
        import inspect

        from odibi_spark.registry import get_registry

        fn = get_registry().get(name)
        return {
            "name": name,
            "signature": str(inspect.signature(fn)),
            "doc": inspect.getdoc(fn) or "",
        }

    def _scaffold(self, name: str = "my_pipeline", source_path: str = "/data/in",
                  target_path: str = "/data/out") -> dict:
        from odibi_spark.scaffold import scaffold_pipeline

        return {"yaml": scaffold_pipeline(
            name, source_path=source_path, target_path=target_path)}

    def _json_schema(self) -> dict:
        from odibi_spark.scaffold import pipeline_json_schema

        return pipeline_json_schema()

    def _list_patterns(self) -> dict:
        from odibi_spark.scaffold import list_patterns

        return {"patterns": list_patterns()}

    def _pattern_template(self, type: str) -> dict:
        from odibi_spark.scaffold import pattern_node_template

        return {"type": type, "yaml": pattern_node_template(type)}

    def _suggest_pipeline(self, name: str, source_path: str,
                          target_path: str) -> dict:
        from odibi_spark.scaffold import suggest_pipeline

        return {"yaml": suggest_pipeline(name, source_path, target_path)}

    # validation ---------------------------------------------------------

    def _load(self, yaml_text: str | None = None, path: str | None = None,
              env: str | None = None):
        from odibi_spark.plans.config import load_pipeline_yaml

        if not (yaml_text or path):
            raise ValueError("pass yaml_text or path")
        return load_pipeline_yaml(path or yaml_text, env=env)

    def _validate_yaml(self, yaml_text: str | None = None, path: str | None = None,
                       env: str | None = None) -> dict:
        try:
            cfg = self._load(yaml_text, path, env)
        except Exception as ex:
            return {"valid": False, "error": str(ex)}
        return {"valid": True, "pipeline": cfg.name, "nodes": [n.name for n in cfg.nodes]}

    def _plan(self, yaml_text: str | None = None, path: str | None = None,
              env: str | None = None) -> dict:
        from odibi_spark.plans.graph import DependencyGraph

        cfg = self._load(yaml_text, path, env)
        graph = DependencyGraph({n.name: n.depends_on for n in cfg.nodes})
        return {"pipeline": cfg.name, "layers": graph.layers()}

    def _lineage(self, yaml_text: str | None = None, path: str | None = None,
                 env: str | None = None) -> dict:
        from odibi_spark.lineage import pipeline_lineage

        return pipeline_lineage(self._load(yaml_text, path, env))

    def _doctor(self, path: str | None = None) -> dict:
        from odibi_spark.doctor import doctor

        return doctor(path)

    # execution ----------------------------------------------------------

    def _run_pipeline(self, path: str, env: str | None = None) -> dict:
        from odibi_spark.plans.pipeline import Pipeline

        cfg = self._load(path=path, env=env)
        results = Pipeline(cfg, self.spark()).run()
        return {
            "pipeline": cfg.name,
            "results": {
                k: {"status": r.status, "rows_written": r.rows_written,
                    "duration_s": r.duration_s, "error": r.error}
                for k, r in results.items()
            },
        }

    def _run_node(self, path: str, node: str, env: str | None = None) -> dict:
        from odibi_spark.plans.pipeline import Pipeline

        cfg = self._load(path=path, env=env)
        r = Pipeline(cfg, self.spark()).run_node(node)
        return {"node": node, "status": r.status, "rows_written": r.rows_written,
                "duration_s": r.duration_s, "error": r.error}

    # semantics ----------------------------------------------------------

    def _sem(self, model):
        import json as _json

        from odibi_spark.semantics.metrics import SemanticModel
        from odibi_spark.semantics.query import SemanticQuery

        if isinstance(model, str):
            model = _json.loads(model)
        return SemanticQuery(SemanticModel.from_dict(model))

    def _semantic_sql(self, model, query: str) -> dict:
        return {"query": query, "sql": self._sem(model).to_sql(query)}

    def _semantic_query(self, model, query: str, source_path: str,
                        limit: int = 100) -> dict:
        import json as _json

        if isinstance(model, str):
            model = _json.loads(model)
        spark = self.spark()
        from odibi_spark.io.read import read_parquet

        read_parquet(spark, source_path).createOrReplaceTempView(model["source"])
        df = self._sem(model).execute(spark, query)
        return {
            "query": query,
            "columns": df.columns,
            "rows": [r.asDict(recursive=True) for r in df.limit(int(limit)).collect()],
        }

    # builder ------------------------------------------------------------

    @property
    def builder(self):
        if getattr(self, "_builder", None) is None:
            from odibi_spark.builder import PipelineBuilder

            self._builder = PipelineBuilder()
        return self._builder

    def _b(self, method: str, *arg_names: str):
        def call(**kwargs):
            known = {k: v for k, v in kwargs.items() if k in arg_names}
            extra = set(kwargs) - set(arg_names)
            if extra:
                raise ValueError(f"unknown args for {method}: {sorted(extra)}")
            return getattr(self.builder, method)(**known)

        return call

    def _b_kw(self, method: str):
        def call(session_id: str, node: str, **kwargs):
            return getattr(self.builder, method)(session_id, node, **kwargs)

        return call

    # guidance -----------------------------------------------------------

    def _list_task_types(self) -> dict:
        from odibi_spark.guidance import list_task_types

        return list_task_types()

    def _get_task_guidance(self, task_type: str) -> dict:
        from odibi_spark.guidance import get_task_guidance

        return get_task_guidance(task_type)

    # onboarding ---------------------------------------------------------

    _DOC_NAMES = ("README.md", "SURVEY.md", "COVERAGE.md", "BASELINE.md",
                  "TESTDATA.md", "FIXTURES.md")

    def _doc_root(self) -> str:
        import os

        return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _docs(self) -> dict[str, str]:
        import os

        root = self._doc_root()
        out = {}
        for name in self._DOC_NAMES:
            p = os.path.join(root, name)
            if os.path.exists(p):
                with open(p, encoding="utf-8") as fh:
                    out[name] = fh.read()
        return out

    def _list_docs(self) -> dict:
        return {"docs": sorted(self._docs())}

    def _get_doc(self, name: str, max_chars: int = 20000) -> dict:
        docs = self._docs()
        if name not in docs:
            return {"error": f"unknown doc '{name}'", "docs": sorted(docs)}
        text = docs[name]
        return {"name": name, "text": text[: int(max_chars)],
                "truncated": len(text) > int(max_chars)}

    def _examples_dir(self) -> str:
        import os

        return os.path.join(self._doc_root(), "examples")

    def _list_examples(self) -> dict:
        import os

        root = self._examples_dir()
        out = []
        for f in sorted(os.listdir(root)) if os.path.isdir(root) else []:
            if not f.endswith((".yaml", ".yml")):
                continue
            with open(os.path.join(root, f), encoding="utf-8") as fh:
                first = fh.readline().strip().lstrip("# ")
            out.append({"name": f, "headline": first})
        return {"examples": out}

    def _get_example(self, name: str) -> dict:
        import os

        if os.path.basename(name) != name:  # no path traversal
            return {"error": "name must be a bare filename"}
        p = os.path.join(self._examples_dir(), name)
        if not os.path.exists(p):
            return {"error": f"unknown example '{name}'",
                    "examples": [e["name"] for e in self._list_examples()["examples"]]}
        with open(p, encoding="utf-8") as fh:
            return {"name": name, "yaml": fh.read()}

    def _search_docs(self, query: str, limit: int = 20) -> dict:
        q = query.lower()
        hits = []
        for name, text in self._docs().items():
            for i, line in enumerate(text.splitlines(), 1):
                if q in line.lower():
                    hits.append({"doc": name, "line": i, "text": line.strip()[:200]})
                    if len(hits) >= int(limit):
                        return {"query": query, "hits": hits, "capped": True}
        return {"query": query, "hits": hits, "capped": False}

    # catalog ------------------------------------------------------------

    def _catalog(self, root: str):
        from odibi_spark.catalog import Catalog

        return Catalog(self.spark(), root)

    def _catalog_runs(self, root: str, pipeline: str | None = None, limit: int = 20) -> dict:
        df = self._catalog(root).runs()
        if pipeline:
            df = df.filter(df.pipeline == pipeline)
        return {"runs": [r.asDict(recursive=True) for r in df.limit(int(limit)).collect()]}

    def _catalog_health(self, root: str) -> dict:
        df = self._catalog(root).pipeline_health()
        return {"health": [r.asDict(recursive=True) for r in df.collect()]}

    def _catalog_tables(self, root: str) -> dict:
        df = self._catalog(root).tables()
        return {"tables": [r.asDict(recursive=True) for r in df.collect()]}


# ---------------------------------------------------------------------------
# MCP stdio transport (newline-delimited JSON-RPC 2.0)

PROTOCOL_VERSION = "2024-11-05"

TOOLS = [
    {
        "name": "odibi_execute",
        "description": (
            "Execute an engine action via the universal dispatcher. "
            "Categories: workloads, discovery, construction, validation, "
            "execution, catalog. Call odibi_help first for the catalog."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "action": {"type": "string", "description": "action name"},
                "args_json": {
                    "type": "string",
                    "description": "JSON object of keyword arguments",
                },
            },
            "required": ["action"],
        },
    },
    {
        "name": "odibi_help",
        "description": "List actions, or detail one (category= or action=).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "category": {"type": "string"},
                "action": {"type": "string"},
            },
        },
    },
]


class MCPServer:
    """Newline-delimited JSON-RPC 2.0 loop over arbitrary file objects
    (stdin/stdout in production; pipes or buffers in tests)."""

    def __init__(self, dispatcher: Dispatcher, *, inp=None, out=None):
        self.dispatcher = dispatcher
        self.inp = inp or sys.stdin
        self.out = out or sys.stdout

    # one message ---------------------------------------------------------

    def handle(self, msg: dict) -> dict | None:
        """Return the response object, or None for notifications."""
        method = msg.get("method")
        msg_id = msg.get("id")
        params = msg.get("params") or {}
        if method == "initialize":
            return self._result(msg_id, {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "odibi-spark", "version": "1.0"},
            })
        if method in ("notifications/initialized", "initialized"):
            return None
        if method == "ping":
            return self._result(msg_id, {})
        if method == "tools/list":
            return self._result(msg_id, {"tools": TOOLS})
        if method == "tools/call":
            return self._tools_call(msg_id, params)
        if msg_id is None:
            return None  # unknown notification: ignore per JSON-RPC
        return self._error(msg_id, -32601, f"method not found: {method}")

    def _tools_call(self, msg_id, params: dict) -> dict:
        name = params.get("name")
        args = params.get("arguments") or {}
        try:
            if name == "odibi_help":
                payload = self.dispatcher.help(
                    category=args.get("category"), action=args.get("action")
                )
            elif name == "odibi_execute":
                kwargs: dict[str, Any] = {}
                raw = args.get("args_json")
                if raw:
                    kwargs = json.loads(raw)
                    if not isinstance(kwargs, dict):
                        raise ValueError("args_json must be a JSON object")
                payload = self.dispatcher.dispatch(args["action"], **kwargs)
            else:
                return self._error(msg_id, -32602, f"unknown tool: {name}")
        except ActionDenied as ex:
            # tool-level error, not protocol error (MCP: isError content)
            payload = {"error": str(ex), "code": "ACTION_DENIED"}
            return self._result(msg_id, self._content(payload, is_error=True))
        except Exception as ex:
            payload = {
                "error": f"{type(ex).__name__}: {ex}",
                "traceback": traceback.format_exc(limit=4),
            }
            return self._result(msg_id, self._content(payload, is_error=True))
        return self._result(msg_id, self._content(payload))

    @staticmethod
    def _content(payload: Any, is_error: bool = False) -> dict:
        return {
            "content": [{"type": "text",
                         "text": json.dumps(payload, indent=2, default=str)}],
            "isError": is_error,
        }

    @staticmethod
    def _result(msg_id, result: dict) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    @staticmethod
    def _error(msg_id, code: int, message: str) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id,
                "error": {"code": code, "message": message}}

    # loop ----------------------------------------------------------------

    def serve(self) -> None:
        for line in self.inp:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError as ex:
                resp = self._error(None, -32700, f"parse error: {ex}")
            else:
                try:
                    resp = self.handle(msg)
                except Exception as ex:  # never kill the loop
                    resp = self._error(msg.get("id"), -32603, f"internal: {ex}")
            if resp is not None:
                self.out.write(json.dumps(resp, default=str) + "\n")
                self.out.flush()


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="odibi_spark MCP stdio server")
    ap.add_argument(
        "--allow", default="",
        help="comma list of extra effect grants: sensitive,session,execution "
             "(default: public reads only — reference stdio posture)",
    )
    args = ap.parse_args(argv)
    allow: set[ActionEffect] = set()
    for tok in filter(None, args.allow.split(",")):
        allow.add({
            "sensitive": ActionEffect.SENSITIVE_READ,
            "session": ActionEffect.SESSION_MUTATION,
            "execution": ActionEffect.EXECUTION,
        }[tok.strip()])
    MCPServer(Dispatcher(allow=allow)).serve()
    return 0


if __name__ == "__main__":
    sys.exit(main())
