"""Lineage + run-report generation (reference: odibi/lineage.py:41
OpenLineage adapter; odibi/story/ HTML "Data Story" reports).

- ``pipeline_lineage``: node-level lineage graph (inputs -> node ->
  outputs) as a plain dict, serializable to the OpenLineage-ish shape.
- ``render_story``: self-contained HTML run report (status per node,
  validation results, DAG edges) — the lightweight analogue of the
  reference's Data Story generator.
"""

from __future__ import annotations

import html
import json
import time


def pipeline_lineage(config) -> dict:
    """Lineage facets from a PipelineConfig."""
    nodes = []
    for n in config.nodes:
        nodes.append(
            {
                "name": n.name,
                "inputs": (
                    [n.read.path or n.read.table] if n.read else list(n.depends_on)
                ),
                "outputs": [n.write.path] if n.write and n.write.path else [],
                "depends_on": list(n.depends_on),
                "transforms": [
                    (s.function or "sql") for s in n.transform
                ],
            }
        )
    return {"pipeline": config.name, "nodes": nodes, "generated_at": time.time()}


def render_story(config, results, *, path: str | None = None) -> str:
    """HTML run report; returns the HTML (and writes it if path given)."""
    rows = []
    for n in config.nodes:
        r = results.get(n.name)
        status = r.status if r else "?"
        color = {"success": "#2e7d32", "failed": "#c62828", "skipped": "#f9a825"}.get(
            status, "#666"
        )
        checks = ""
        if r and r.validation:
            checks = "<br>".join(
                f"{'✓' if t.passed else '✗'} {html.escape(t.name)} "
                f"({t.failed_rows}/{t.total_rows} failed)"
                for t in r.validation
            )
        err = html.escape(r.error or "") if r else ""
        deps = ", ".join(n.depends_on) or "—"
        dur = f"{r.duration_s:.2f}s" if r and r.duration_s is not None else "—"
        nrows = (
            f"{r.rows_written:,}" if r and r.rows_written is not None else "—"
        )
        rows.append(
            f"<tr><td>{html.escape(n.name)}</td>"
            f"<td style='color:{color};font-weight:bold'>{status}</td>"
            f"<td>{deps}</td><td>{dur}</td><td>{nrows}</td>"
            f"<td>{checks}</td><td>{err}</td></tr>"
        )
    doc = f"""<!doctype html><html><head><meta charset="utf-8">
<title>Run report — {html.escape(config.name)}</title>
<style>body{{font-family:system-ui,sans-serif;margin:2rem}}
table{{border-collapse:collapse;width:100%}}
td,th{{border:1px solid #ddd;padding:.5rem;text-align:left;vertical-align:top}}
th{{background:#f5f5f5}}</style></head><body>
<h1>{html.escape(config.name)}</h1>
<p>generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}</p>
<table><tr><th>node</th><th>status</th><th>depends on</th>
<th>duration</th><th>rows written</th>
<th>validation</th><th>error</th></tr>
{''.join(rows)}
</table>
<h2>Lineage</h2>
<pre>{html.escape(json.dumps(pipeline_lineage(config), indent=2, default=str))}</pre>
</body></html>"""
    if path:
        with open(path, "w") as f:
            f.write(doc)
    return doc
