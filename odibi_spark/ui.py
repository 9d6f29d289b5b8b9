"""Observability UI: a zero-dependency dashboard over the catalog.

Parity target (reference: odibi/cli/ui.py + odibi/ui/app.py — the
``odibi ui`` verb launches a FastAPI/uvicorn observability app over
the system catalog). Documented deviation: FastAPI/uvicorn are not
available in this environment, so this twin serves the same surface
from the stdlib (``http.server.ThreadingHTTPServer``):

- ``/``                 server-rendered HTML dashboard (health,
                        recent runs, daily stats)
- ``/api/health``       pipeline_health() rows as JSON
- ``/api/runs?limit=N`` newest meta_runs rows as JSON
- ``/api/daily-stats``  meta_daily_stats rows as JSON
- ``/api/pipelines``    deployed definitions (latest version each)

Data is read per-request through the Catalog's Spark queries — the
catalog is O(runs) small, and no state is cached so the page always
reflects the latest writes. Spark sessions are thread-safe for
concurrent reads, so the threading server needs no locking.
"""

from __future__ import annotations

import html
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

__all__ = ["make_server", "serve_ui", "render_dashboard"]


def _rows(df, limit: int | None = None) -> list[dict]:
    if limit is not None:
        df = df.limit(limit)
    return [r.asDict(recursive=True) for r in df.collect()]


def _fmt_ts(v) -> str:
    if v is None:
        return "—"
    return time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(float(v)))


def _table(rows: list[dict], columns: list[tuple[str, str]]) -> str:
    head = "".join(f"<th>{html.escape(t)}</th>" for _, t in columns)
    body = []
    for row in rows:
        cells = []
        for key, _ in columns:
            v = row.get(key)
            if key.endswith("_at"):
                v = _fmt_ts(v)
            elif isinstance(v, float):
                v = f"{v:.3f}"
            cells.append(f"<td>{html.escape(str(v if v is not None else '—'))}</td>")
        body.append("<tr>" + "".join(cells) + "</tr>")
    return (
        f"<table><thead><tr>{head}</tr></thead>"
        f"<tbody>{''.join(body) or '<tr><td>no rows</td></tr>'}</tbody></table>"
    )


def render_dashboard(catalog) -> str:
    """One self-contained HTML page from live catalog queries."""
    sections = []

    def section(title: str, inner: str) -> None:
        sections.append(f"<section><h2>{html.escape(title)}</h2>{inner}</section>")

    try:
        health = _rows(catalog.pipeline_health())
        section(
            "Pipeline health",
            _table(health, [
                ("pipeline", "pipeline"), ("total_runs", "runs"),
                ("total_successes", "ok"), ("total_failures", "failed"),
                ("success_rate_7d", "7d rate"),
                ("success_rate_30d", "30d rate"),
                ("last_success_at", "last success"),
                ("last_run_at", "last run"),
            ]),
        )
    except Exception:
        section("Pipeline health", "<p>no runs recorded yet</p>")
    try:
        runs = _rows(
            catalog.runs().orderBy("finished_at", ascending=False), limit=50
        )
        section(
            "Recent runs (latest 50 node results)",
            _table(runs, [
                ("run_id", "run"), ("pipeline", "pipeline"),
                ("node", "node"), ("status", "status"),
                ("rows_written", "rows"), ("duration_s", "seconds"),
                ("finished_at", "finished"),
            ]),
        )
    except Exception:
        section("Recent runs", "<p>no runs recorded yet</p>")
    try:
        stats = _rows(
            catalog.daily_stats().orderBy("date", ascending=False), limit=30
        )
        section(
            "Daily stats (last 30 days)",
            _table(stats, [
                ("date", "date"), ("pipeline", "pipeline"),
                ("runs", "runs"), ("successes", "ok"),
                ("failures", "failed"), ("total_rows", "rows"),
                ("total_duration_s", "seconds"),
            ]),
        )
    except Exception:
        section("Daily stats", "<p>no daily stats yet</p>")
    return f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>odibi_spark — observability</title>
<style>
 body {{ font: 14px/1.5 system-ui, sans-serif; margin: 2rem; color: #222; }}
 h1 {{ font-size: 1.4rem; }} h2 {{ font-size: 1.1rem; margin-top: 2rem; }}
 table {{ border-collapse: collapse; width: 100%; }}
 th, td {{ text-align: left; padding: .3rem .6rem;
           border-bottom: 1px solid #ddd; }}
 th {{ background: #f5f5f5; }}
 footer {{ margin-top: 2rem; color: #888; font-size: .85rem; }}
</style></head><body>
<h1>odibi_spark observability</h1>
<p>catalog: <code>{html.escape(catalog.root)}</code></p>
{''.join(sections)}
<footer>JSON: /api/health · /api/runs?limit=N · /api/daily-stats ·
/api/pipelines</footer>
</body></html>"""


def make_server(catalog, host: str = "127.0.0.1", port: int = 0):
    """Build (but don't start) the HTTP server — port 0 picks a free
    port; read it back from ``server.server_address``."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: tests and CLIs share stderr
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, payload) -> None:
            self._send(
                200, json.dumps(payload, default=str).encode(),
                "application/json",
            )

        def do_GET(self):  # noqa: N802 — http.server contract
            parsed = urlparse(self.path)
            try:
                if parsed.path == "/":
                    self._send(
                        200, render_dashboard(catalog).encode(),
                        "text/html; charset=utf-8",
                    )
                elif parsed.path == "/api/health":
                    self._json(_rows(catalog.pipeline_health()))
                elif parsed.path == "/api/runs":
                    limit = int(
                        parse_qs(parsed.query).get("limit", ["100"])[0]
                    )
                    self._json(_rows(
                        catalog.runs().orderBy(
                            "finished_at", ascending=False
                        ),
                        limit=limit,
                    ))
                elif parsed.path == "/api/daily-stats":
                    self._json(_rows(catalog.daily_stats()))
                elif parsed.path == "/api/pipelines":
                    self._json(_rows(catalog.pipelines()))
                else:
                    self._send(404, b'{"error": "not found"}',
                               "application/json")
            except Exception as exc:  # empty catalog dirs etc.
                self._send(
                    200 if parsed.path != "/" else 500,
                    json.dumps({"error": str(exc), "rows": []}).encode(),
                    "application/json",
                )

    return ThreadingHTTPServer((host, port), Handler)


def serve_ui(catalog, host: str = "127.0.0.1", port: int = 8000) -> None:
    server = make_server(catalog, host, port)
    actual = server.server_address[1]
    print(f"odibi_spark UI on http://{host}:{actual} (Ctrl-C to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
