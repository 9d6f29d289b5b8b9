"""Lineage + Data Story generation (reference: odibi/lineage.py:41
OpenLineage adapter; odibi/story/generator.py + renderers.py — the
HTML "Data Story" run report with per-node detail and a lineage
graph).

- ``pipeline_lineage``: node-level lineage graph (inputs -> node ->
  outputs) as a plain dict, serializable to the OpenLineage-ish shape.
- ``render_story``: self-contained HTML run report. With a pipeline
  ``context`` it adds per-node sections: output schema, sample rows,
  validation detail, timings — the Spark-side analogue of the
  reference's StoryGenerator (odibi/story/generator.py:94-298).
  Driver-side cost is bounded: one ``limit(sample_rows)`` collect per
  succeeded node, schemas are metadata-only.
"""

from __future__ import annotations

import html
import json
import time

_CSS = """body{font-family:system-ui,sans-serif;margin:2rem;max-width:70rem}
table{border-collapse:collapse;width:100%;margin:.5rem 0}
td,th{border:1px solid #ddd;padding:.4rem .6rem;text-align:left;vertical-align:top;font-size:.9rem}
th{background:#f5f5f5}
.scoreboard span{display:inline-block;padding:.3rem .8rem;margin-right:.5rem;border-radius:4px;color:#fff;font-weight:bold}
.node-section{border:1px solid #e0e0e0;border-radius:6px;padding:1rem;margin:1rem 0}
.node-section h3{margin-top:0}
.bar{height:.7rem;background:#90caf9;display:inline-block;vertical-align:middle}
.err{color:#c62828;white-space:pre-wrap;font-family:monospace;font-size:.85rem}
svg text{font-family:system-ui,sans-serif;font-size:12px}"""

_STATUS_COLOR = {"success": "#2e7d32", "failed": "#c62828", "skipped": "#f9a825"}


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


def _dag_layers(config) -> list[list[str]]:
    """Topological layers for the graph layout (deterministic)."""
    deps = {n.name: [d for d in n.depends_on] for n in config.nodes}
    placed: dict[str, int] = {}
    remaining = list(deps)
    while remaining:
        progressed = False
        for name in list(remaining):
            ds = [d for d in deps[name] if d in deps]
            if all(d in placed for d in ds):
                placed[name] = max((placed[d] + 1 for d in ds), default=0)
                remaining.remove(name)
                progressed = True
        if not progressed:  # cycle — flatten the rest into one layer
            for name in remaining:
                placed[name] = max(placed.values(), default=0) + 1
            break
    nlayers = max(placed.values(), default=0) + 1
    layers: list[list[str]] = [[] for _ in range(nlayers)]
    for n in config.nodes:  # config order within a layer: deterministic
        layers[placed[n.name]].append(n.name)
    return layers


def render_dag_svg(config, results=None) -> str:
    """Inline SVG of the node DAG (reference lineage graph,
    odibi/story/lineage.py): layers left-to-right, nodes colored by
    run status, edges as lines. Pure geometry — no JS."""
    results = results or {}
    layers = _dag_layers(config)
    box_w, box_h, gap_x, gap_y, pad = 150, 34, 70, 18, 10
    pos: dict[str, tuple[int, int]] = {}
    for li, layer in enumerate(layers):
        for ni, name in enumerate(layer):
            pos[name] = (pad + li * (box_w + gap_x), pad + ni * (box_h + gap_y))
    width = pad * 2 + len(layers) * (box_w + gap_x) - gap_x
    height = pad * 2 + max((len(l) for l in layers), default=1) * (box_h + gap_y) - gap_y
    parts = [
        f'<svg viewBox="0 0 {width} {height}" width="{width}" '
        f'xmlns="http://www.w3.org/2000/svg">'
    ]
    names = {n.name for n in config.nodes}
    for n in config.nodes:
        for d in n.depends_on:
            if d not in names:
                continue
            x1, y1 = pos[d]
            x2, y2 = pos[n.name]
            parts.append(
                f'<line x1="{x1 + box_w}" y1="{y1 + box_h // 2}" '
                f'x2="{x2}" y2="{y2 + box_h // 2}" stroke="#999" stroke-width="1.5"/>'
            )
    for name, (x, y) in pos.items():
        r = results.get(name)
        color = _STATUS_COLOR.get(r.status if r else "", "#90a4ae")
        # SVG anchor: clicking a node jumps to its drill-down section
        parts.append(
            f'<a href="#node-{html.escape(name)}">'
            f'<rect x="{x}" y="{y}" width="{box_w}" height="{box_h}" rx="5" '
            f'fill="#fff" stroke="{color}" stroke-width="2.5"/>'
            f'<text x="{x + box_w // 2}" y="{y + box_h // 2 + 4}" '
            f'text-anchor="middle">{html.escape(name)}</text></a>'
        )
    parts.append("</svg>")
    return "".join(parts)


def _schema_table(df) -> str:
    rows = "".join(
        f"<tr><td>{html.escape(f.name)}</td>"
        f"<td>{html.escape(f.dataType.simpleString())}</td>"
        f"<td>{f.nullable}</td></tr>"
        for f in df.schema.fields
    )
    return (
        "<table><tr><th>column</th><th>type</th><th>nullable</th></tr>"
        f"{rows}</table>"
    )


def _sample_table(df, n: int) -> str:
    try:
        taken = df.limit(n).collect()
    except Exception as ex:  # sampling must never fail the report
        return f"<p class='err'>sample unavailable: {html.escape(str(ex))}</p>"
    if not taken:
        return "<p>(no rows)</p>"
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{html.escape(_fmt_cell(row[c]))}</td>" for c in cols
        )
        + "</tr>"
        for row in taken
    )
    return f"<table><tr>{head}</tr>{body}</table>"


def _fmt_cell(v, maxlen: int = 80) -> str:
    s = "NULL" if v is None else str(v)
    return s if len(s) <= maxlen else s[: maxlen - 1] + "…"


def _validation_table(tests) -> str:
    rows = "".join(
        f"<tr><td>{'✓' if t.passed else '✗'}</td>"
        f"<td>{html.escape(t.name)}</td><td>{html.escape(t.test_type)}</td>"
        f"<td>{t.failed_rows:,} / {t.total_rows:,}</td>"
        f"<td>{(t.failed_rows / t.total_rows if t.total_rows else 0):.2%}"
        f" / {t.threshold:.2%}</td>"
        f"<td>{'quarantine' if t.quarantine else '—'}</td></tr>"
        for t in tests
    )
    return (
        "<table><tr><th></th><th>test</th><th>type</th>"
        "<th>failed / total rows</th><th>fail rate / threshold</th>"
        f"<th>action</th></tr>{rows}</table>"
    )


def _node_links(names) -> str:
    return ", ".join(
        f'<a href="#node-{html.escape(d)}">{html.escape(d)}</a>' for d in names
    )


def _node_section(n, r, context, sample_rows: int, downstream=()) -> str:
    status = r.status if r else "?"
    color = _STATUS_COLOR.get(status, "#666")
    bits = [f'<div class="node-section" id="node-{html.escape(n.name)}">']
    bits.append(
        f"<h3>{html.escape(n.name)} "
        f'<span style="color:{color}">({status})</span></h3>'
    )
    # lineage edges: upstream nodes, source reads, sink writes, and the
    # downstream consumers of this node — each node link navigates
    meta = []
    if n.depends_on:
        meta.append("depends on: " + _node_links(n.depends_on))
    if downstream:
        meta.append("feeds: " + _node_links(downstream))
    if n.read:
        meta.append(f"reads: {html.escape(n.read.path or n.read.table or '')}")
    if n.transform:
        meta.append(
            "transforms: "
            + html.escape(" → ".join(s.function or "sql" for s in n.transform))
        )
    if n.pattern:
        meta.append(f"pattern: {html.escape(n.pattern.type)}")
    if n.write and n.write.path:
        meta.append(f"writes: {html.escape(n.write.path)} ({n.write.mode})")
    if r and r.duration_s is not None:
        meta.append(f"duration: {r.duration_s:.2f}s")
    if r and getattr(r, "rows_written", None) is not None:
        meta.append(f"rows written: {r.rows_written:,}")
    bits.append("<p>" + " · ".join(meta) + "</p>" if meta else "")
    if r and r.error:
        bits.append(f'<div class="err">{html.escape(r.error)}</div>')
    if r and getattr(r, "validation", None):
        bits.append(
            f'<h4 id="node-{html.escape(n.name)}-validation">Validation</h4>'
            + _validation_table(r.validation)
        )
    df = None
    if context is not None and status == "success":
        try:
            df = context.get(n.name)
        except Exception:
            df = None
    if df is not None:
        bits.append("<h4>Output schema</h4>" + _schema_table(df))
        if sample_rows > 0:
            bits.append(f"<h4>Sample ({sample_rows} rows)</h4>")
            bits.append(_sample_table(df, sample_rows))
    bits.append("</div>")
    return "".join(bits)


def render_story(
    config,
    results,
    *,
    path: str | None = None,
    context=None,
    sample_rows: int = 5,
) -> str:
    """HTML Data Story; returns the HTML (and writes it if path given).

    Without ``context``: summary table + DAG + lineage JSON. With the
    pipeline's ``context`` (Pipeline.context after run()): adds
    per-node sections with output schema, sample rows, and validation
    detail (reference odibi/story/generator.py per-node metadata)."""
    statuses = [r.status for r in results.values()]
    n_ok = statuses.count("success")
    n_bad = statuses.count("failed")
    n_skip = statuses.count("skipped")
    total_s = sum(r.duration_s or 0 for r in results.values())
    max_s = max((r.duration_s or 0 for r in results.values()), default=0) or 1

    # reverse edges once: node -> its downstream consumers (config order)
    downstream: dict[str, list[str]] = {n.name: [] for n in config.nodes}
    for n in config.nodes:
        for d in n.depends_on:
            if d in downstream:
                downstream[d].append(n.name)

    summary_rows = []
    for n in config.nodes:
        r = results.get(n.name)
        status = r.status if r else "?"
        color = _STATUS_COLOR.get(status, "#666")
        dur = r.duration_s if r and r.duration_s is not None else None
        bar = (
            f'<span class="bar" style="width:{max(2, int(120 * dur / max_s))}px"></span>'
            f" {dur:.2f}s"
            if dur is not None
            else "—"
        )
        nrows = f"{r.rows_written:,}" if r and getattr(r, "rows_written", None) is not None else "—"
        tests = list(getattr(r, "validation", None) or [])
        if tests:
            n_pass = sum(1 for t in tests if t.passed)
            mark = "✓" if n_pass == len(tests) else "✗"
            vcell = (
                f'<a href="#node-{html.escape(n.name)}-validation">'
                f"{mark} {n_pass}/{len(tests)} tests</a>"
            )
        else:
            vcell = "—"
        summary_rows.append(
            f'<tr><td><a href="#node-{html.escape(n.name)}">{html.escape(n.name)}</a></td>'
            f"<td style='color:{color};font-weight:bold'>{status}</td>"
            f"<td>{bar}</td><td>{nrows}</td><td>{vcell}</td></tr>"
        )

    sections = "".join(
        _node_section(
            n, results.get(n.name), context, sample_rows,
            downstream=downstream.get(n.name, ()),
        )
        for n in config.nodes
    )
    doc = f"""<!doctype html><html><head><meta charset="utf-8">
<title>Data Story — {html.escape(config.name)}</title>
<style>{_CSS}</style></head><body>
<h1>{html.escape(config.name)}</h1>
<p>generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}</p>
<div class="scoreboard">
<span style="background:#2e7d32">{n_ok} passed</span>
<span style="background:#c62828">{n_bad} failed</span>
<span style="background:#f9a825">{n_skip} skipped</span>
<span style="background:#546e7a">{total_s:.2f}s total</span>
</div>
<h2>Pipeline graph</h2>
{render_dag_svg(config, results)}
<h2>Run summary</h2>
<table><tr><th>node</th><th>status</th><th>duration</th><th>rows written</th><th>validation</th></tr>
{''.join(summary_rows)}
</table>
<h2>Nodes</h2>
{sections}
<h2>Lineage</h2>
<pre>{html.escape(json.dumps(pipeline_lineage(config), indent=2, default=str))}</pre>
</body></html>"""
    if path:
        with open(path, "w") as f:
            f.write(doc)
    return doc
