"""Configuration-manual generator (VERDICT r14 task 5; reference
parity: odibi/introspect.py:1-1329 ``generate_docs`` — the reference
walks its pydantic config models and ships a generated YAML-schema
manual; the repo's CLI previously covered only single-key
``explain``).

Walks every pydantic model in the plans config modules plus the live
operator registry and renders ONE deterministic markdown manual:

- per model: docstring summary, a field table (name, type,
  required/default), and a "used in" reverse index derived from
  field annotations that reference other config models;
- per registered transformer: signature + docstring summary — the
  same source of truth the ``explain`` CLI reads, so the manual can
  never drift from the dispatch surface.

Determinism matters: the manual is committed under ``examples/`` and
a drift pytest regenerates it from the models on every run — if a
field or transformer changes without the manual, the test fails (the
reference regenerates docs/reference/yaml_schema.md the same way).
"""

from __future__ import annotations

import inspect

MODEL_MODULES = (
    "odibi_spark.plans.config",
    "odibi_spark.plans.project",
    "odibi_spark.plans.recipes",
)


def _type_str(annotation) -> str:
    """Human-readable type string: strip module prefixes, keep the
    generic structure (the reference's clean_type_str/format_type_hint
    pair, collapsed)."""
    if annotation is None or annotation is type(None):
        return "None"
    s = str(annotation)
    s = s.replace("typing.", "")
    s = s.replace("<class '", "").replace("'>", "")
    for prefix in ("odibi_spark.plans.config.", "odibi_spark.plans.project.",
                   "odibi_spark.plans.recipes.", "builtins."):
        s = s.replace(prefix, "")
    return s


def discover_models() -> list[tuple[str, type]]:
    """Every pydantic model class defined in the plans config modules,
    in (module, definition) order — deterministic."""
    import importlib

    from pydantic import BaseModel

    out: list[tuple[str, type]] = []
    seen: set[type] = set()
    for mod_name in MODEL_MODULES:
        mod = importlib.import_module(mod_name)
        for _name, obj in inspect.getmembers(mod, inspect.isclass):
            if (
                issubclass(obj, BaseModel)
                and obj.__module__ == mod_name
                and obj.__name__ != "StrictModel"
                and obj not in seen
            ):
                seen.add(obj)
                out.append((mod_name, obj))
    out.sort(key=lambda t: (t[0], t[1].__name__))
    return out


def _field_rows(model) -> list[tuple[str, str, str]]:
    """(name, type, required/default) per pydantic field, in model
    definition order."""
    rows = []
    for name, f in model.model_fields.items():
        t = _type_str(f.annotation)
        if f.is_required():
            req = "**required**"
        else:
            d = f.get_default(call_default_factory=True)
            if d is None:
                req = "default: `None`"
            elif d == "" or d == [] or d == {}:
                req = f"default: `{d!r}`"
            else:
                req = f"default: `{d!r}`"
        rows.append((name, t, req))
    return rows


def _usage_map(models: list[tuple[str, type]]) -> dict[str, list[str]]:
    """Reverse index: model name -> models whose fields reference it
    (the reference's build_usage_map)."""
    names = {cls.__name__ for _m, cls in models}
    used_in: dict[str, set[str]] = {}
    for _mod, cls in models:
        for f in cls.model_fields.values():
            ann = str(f.annotation)
            for n in names:
                if n != cls.__name__ and n in ann:
                    used_in.setdefault(n, set()).add(cls.__name__)
    return {n: sorted(v) for n, v in used_in.items()}


def transformer_rows() -> list[tuple[str, str, str]]:
    """(name, signature, summary) for every registered transformer —
    read from the live registry so the manual cannot drift from the
    dispatch surface."""
    import odibi_spark.operators  # noqa: F401 — registers operators
    from odibi_spark.registry import get_registry

    reg = get_registry()
    rows = []
    for name in reg.list():
        fn = reg.get(name)
        try:
            sig = str(inspect.signature(fn))
        except (TypeError, ValueError):
            sig = "(...)"
        doc = inspect.getdoc(fn) or ""
        summary = doc.split("\n", 1)[0].strip()
        rows.append((name, sig, summary))
    return rows


def generate_config_manual() -> str:
    """The full markdown manual, deterministically ordered."""
    models = discover_models()
    usage = _usage_map(models)
    lines = [
        "# odibi_spark Configuration Reference",
        "",
        "YAML configuration schema for odibi_spark pipelines.",
        "*Auto-generated from the pydantic config models and the live*",
        "*operator registry — regenerate with*",
        "`odibi-spark docs config-manual` *(drift-checked by pytest).*",
        "",
    ]
    by_mod: dict[str, list[type]] = {}
    for mod, cls in models:
        by_mod.setdefault(mod, []).append(cls)
    titles = {
        "odibi_spark.plans.config": "Pipeline Configuration",
        "odibi_spark.plans.project": "Project Configuration",
        "odibi_spark.plans.recipes": "Recipes",
    }
    for mod in MODEL_MODULES:
        classes = by_mod.get(mod, [])
        if not classes:
            continue
        lines += [f"## {titles.get(mod, mod)}", ""]
        for cls in classes:
            lines.append(f"### `{cls.__name__}`")
            lines.append("")
            doc = inspect.getdoc(cls)
            if doc and not doc.startswith(
                "Usage docs: https://docs.pydantic.dev"
            ):
                lines.append(doc.strip())
                lines.append("")
            if cls.__name__ in usage:
                refs = ", ".join(f"`{u}`" for u in usage[cls.__name__])
                lines.append(f"*Used in: {refs}*")
                lines.append("")
            rows = _field_rows(cls)
            if rows:
                lines.append("| Field | Type | Required / Default |")
                lines.append("|---|---|---|")
                for name, t, req in rows:
                    lines.append(f"| `{name}` | `{t}` | {req} |")
                lines.append("")
    lines += [
        "## Transformation Reference",
        "",
        "Registered transformer steps (`transform: [{op: <name>, ...}]`),",
        "from the live registry. `odibi-spark explain <name>` prints the",
        "full docstring.",
        "",
        "| Transformer | Signature | Summary |",
        "|---|---|---|",
    ]
    for name, sig, summary in transformer_rows():
        sig_md = sig.replace("|", "\\|")
        summary_md = summary.replace("|", "\\|")
        lines.append(f"| `{name}` | `{sig_md}` | {summary_md} |")
    lines.append("")
    return "\n".join(lines)
