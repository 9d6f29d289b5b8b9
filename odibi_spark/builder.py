"""Session-based incremental pipeline builder.

Reference parity: ``odibi_mcp/tools/builder.py`` (Session Builder
category — create_pipeline / add_node / configure_read / transform /
write / validation / get_pipeline_state / render_pipeline_yaml /
list_sessions / discard_pipeline; thread-safe sessions with a lock,
TTL eviction, LRU at capacity, render validated before returning).
An agent on the MCP gateway assembles a pipeline node by node and
only ever receives YAML that already passed the strict pydantic
config — invalid intermediate states are inspectable but cannot be
rendered as final.

Everything is in-process memory: no Spark, no filesystem. The clock
is injectable so TTL behavior is testable without sleeping.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

import yaml


@dataclass
class _Session:
    session_id: str
    pipeline_name: str
    nodes: list[dict] = field(default_factory=list)
    created_at: float = 0.0
    last_touched: float = 0.0

    def node(self, name: str) -> dict | None:
        return next((n for n in self.nodes if n["name"] == name), None)


class BuilderError(ValueError):
    pass


class PipelineBuilder:
    """In-memory multi-session pipeline assembly."""

    def __init__(
        self,
        *,
        max_sessions: int = 10,
        ttl_seconds: float = 1800.0,
        clock: Callable[[], float] = time.time,
    ):
        self._sessions: dict[str, _Session] = {}
        self._lock = threading.Lock()
        self.max_sessions = max_sessions
        self.ttl_seconds = ttl_seconds
        self._clock = clock

    # -- session lifecycle ------------------------------------------------

    def _evict_expired(self) -> None:
        now = self._clock()
        for sid in [
            s for s, v in self._sessions.items()
            if now - v.last_touched > self.ttl_seconds
        ]:
            del self._sessions[sid]

    def _make_room(self) -> None:
        """LRU-evict until one slot is free — called from create() only
        (a read like list_sessions must never drop a live session)."""
        while len(self._sessions) >= self.max_sessions:
            oldest = min(self._sessions, key=lambda s: self._sessions[s].last_touched)
            del self._sessions[oldest]

    def _get(self, session_id: str) -> _Session:
        sess = self._sessions.get(session_id)
        if sess is None or self._clock() - sess.last_touched > self.ttl_seconds:
            self._sessions.pop(session_id, None)
            raise BuilderError(
                f"unknown or expired session '{session_id}'; "
                f"active: {sorted(self._sessions)}"
            )
        sess.last_touched = self._clock()
        return sess

    def create(self, pipeline_name: str) -> dict:
        with self._lock:
            self._evict_expired()
            self._make_room()
            sid = uuid.uuid4().hex[:12]
            now = self._clock()
            self._sessions[sid] = _Session(
                session_id=sid, pipeline_name=pipeline_name,
                created_at=now, last_touched=now,
            )
            return {"session_id": sid, "pipeline": pipeline_name}

    def list_sessions(self) -> dict:
        with self._lock:
            self._evict_expired()
            return {
                "sessions": [
                    {
                        "session_id": s.session_id,
                        "pipeline": s.pipeline_name,
                        "nodes": [n["name"] for n in s.nodes],
                    }
                    for s in sorted(
                        self._sessions.values(), key=lambda s: s.created_at
                    )
                ]
            }

    def discard(self, session_id: str) -> dict:
        with self._lock:
            existed = self._sessions.pop(session_id, None) is not None
            return {"discarded": existed, "session_id": session_id}

    # -- node assembly ----------------------------------------------------

    def add_node(
        self, session_id: str, name: str, depends_on: list[str] | None = None
    ) -> dict:
        with self._lock:
            sess = self._get(session_id)
            if sess.node(name):
                raise BuilderError(f"node '{name}' already exists")
            for dep in depends_on or []:
                if not sess.node(dep):
                    raise BuilderError(
                        f"depends_on '{dep}' is not a node yet; "
                        f"have: {[n['name'] for n in sess.nodes]}"
                    )
            node: dict[str, Any] = {"name": name}
            if depends_on:
                node["depends_on"] = list(depends_on)
            sess.nodes.append(node)
            return self._node_state(sess, name)

    def configure_read(
        self, session_id: str, node: str, *,
        format: str = "parquet", path: str | None = None,
        table: str | None = None, connection: str | None = None,
        options: dict | None = None, filter: str | None = None,
        columns: list[str] | None = None,
    ) -> dict:
        read: dict[str, Any] = {"format": format}
        for k, v in (
            ("path", path), ("table", table), ("connection", connection),
            ("options", options), ("filter", filter), ("columns", columns),
        ):
            if v is not None:
                read[k] = v
        return self._set(session_id, node, "read", read)

    def configure_transform(
        self, session_id: str, node: str, steps: list[dict]
    ) -> dict:
        """APPEND transform steps; unknown function names fail fast
        against the live registry (reference validates at configure
        time, not render time)."""
        import odibi_spark.llm.transforms  # noqa: F401 — registers
        import odibi_spark.operators  # noqa: F401

        from odibi_spark.registry import get_registry

        reg = get_registry()
        for s in steps:
            fn = s.get("function")
            if fn and not reg.has(fn):
                raise BuilderError(
                    f"unknown transform function '{fn}'; see list_transformers"
                )
            if not fn and not s.get("sql") and not s.get("sql_file"):
                raise BuilderError(f"step needs function/sql/sql_file: {s}")
        with self._lock:
            sess = self._get(session_id)
            n = sess.node(node)
            if n is None:
                raise BuilderError(f"unknown node '{node}'")
            n.setdefault("transform", []).extend(steps)
            return self._node_state(sess, node)

    def configure_write(
        self, session_id: str, node: str, *,
        format: str = "parquet", path: str | None = None,
        table: str | None = None, connection: str | None = None,
        mode: str = "overwrite", options: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        write: dict[str, Any] = {"format": format, "mode": mode}
        for k, v in (
            ("path", path), ("table", table), ("connection", connection),
            ("options", options), ("partition_by", partition_by),
        ):
            if v is not None:
                write[k] = v
        return self._set(session_id, node, "write", write)

    def configure_validation(
        self, session_id: str, node: str, tests: list[dict]
    ) -> dict:
        return self._set(session_id, node, "validation", {"tests": tests})

    def _set(self, session_id: str, node: str, key: str, value) -> dict:
        with self._lock:
            sess = self._get(session_id)
            n = sess.node(node)
            if n is None:
                raise BuilderError(f"unknown node '{node}'")
            n[key] = value
            return self._node_state(sess, node)

    # -- inspection / render ----------------------------------------------

    @staticmethod
    def _node_state(sess: _Session, name: str) -> dict:
        n = dict(sess.node(name))
        missing = []
        if "read" not in n and not n.get("depends_on"):
            missing.append("read or depends_on")
        if "write" not in n and "materialize_view" not in n:
            missing.append("write (or materialize_view)")
        return {"session_id": sess.session_id, "node": n, "missing": missing}

    def state(self, session_id: str) -> dict:
        with self._lock:
            sess = self._get(session_id)
            return {
                "session_id": sess.session_id,
                "pipeline": sess.pipeline_name,
                "nodes": [self._node_state(sess, n["name"]) for n in sess.nodes],
            }

    def render_yaml(self, session_id: str) -> dict:
        """Serialize and VALIDATE through the strict loader; invalid
        states return the error instead of unrunnable YAML."""
        from odibi_spark.plans.config import load_pipeline_yaml

        with self._lock:
            sess = self._get(session_id)
            doc = {"name": sess.pipeline_name, "nodes": sess.nodes}
        text = yaml.safe_dump(doc, sort_keys=False, default_flow_style=False)
        try:
            cfg = load_pipeline_yaml(text)
        except Exception as ex:
            return {"valid": False, "error": str(ex), "yaml": text}
        return {"valid": True, "pipeline": cfg.name,
                "nodes": [n.name for n in cfg.nodes], "yaml": text}
