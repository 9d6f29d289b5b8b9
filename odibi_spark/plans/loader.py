"""Config loading: env/vars/date substitution, imports, environments.

Parity target (reference: odibi/utils/config_loader.py:1-640
``load_yaml_with_env``). Order of operations kept from the reference:

1. ``${VAR}`` / ``${env:VAR}`` substitute from the process environment
   BEFORE parsing (text-level, so secrets can appear inside any quoted
   scalar); a missing variable is an error naming it (:406-424).
2. ``imports:`` (string or list) load recursively relative to the
   importing file and deep-merge INTO it — the imported file's values
   win on conflicts and ``pipelines`` lists append (:474-533; the
   reference's documented behavior, kept as-is).
3. ``environments: {<env>: <overrides>}`` deep-merges the named block
   when ``env=`` is given (:535-549), then an external sibling
   ``env.<env>.yaml`` merges on top (:551-580).
4. ``${vars.x}`` substitutes from the merged ``vars:`` block AFTER all
   merges (imported files may reference parent vars), full-match
   placeholders preserving the variable's type (:148-191), then
   ``${date:expr[:fmt]}`` resolves (:25-131). Both run only at the
   top level of the load recursion.

The consumed ``imports`` / ``environments`` / ``vars`` keys are
removed so the strict pydantic models still reject unknown fields.
``${recipe.x}`` placeholders pass through untouched (dots don't match
the env/vars patterns) for the recipe layer to resolve.
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timedelta
from typing import Any, Mapping

ENV_PATTERN = re.compile(r"\$\{(?:env:)?([A-Za-z0-9_]+)\}")
VARS_PATTERN = re.compile(r"\$\{vars\.([A-Za-z0-9_]+)\}")
DATE_PATTERN = re.compile(r"\$\{date:([^}:]+)(?::([^}]+))?\}")

__all__ = [
    "load_config",
    "substitute_env",
    "resolve_date_expression",
    "find_env_vars",
    "collect_env_vars",
]


def find_env_vars(text: str) -> list[str]:
    """Unique ``${VAR}`` / ``${env:VAR}`` names, first-seen order."""
    seen: dict[str, None] = {}
    for m in ENV_PATTERN.finditer(text):
        seen.setdefault(m.group(1))
    return list(seen)


def collect_env_vars(path: str) -> list[str]:
    """Every ``${VAR}`` name a config references, following its
    ``imports:`` chain (for ``secrets init``/``validate`` — reference:
    odibi/cli/secrets.py:18-33). Text-level scan: no substitution is
    performed, so it works with unset variables."""
    import yaml

    seen: dict[str, None] = {}
    visited: set[str] = set()

    def _walk(p: str) -> None:
        p = os.path.abspath(p)
        if p in visited:
            return
        visited.add(p)
        with open(p, encoding="utf-8") as f:
            text = f.read()
        for name in find_env_vars(text):
            seen.setdefault(name)
        try:
            doc = yaml.safe_load(text)
        except Exception:
            return
        if not isinstance(doc, dict):
            return
        imports = doc.get("imports", [])
        if isinstance(imports, str):
            imports = [imports]
        for imp in imports:
            full = imp if os.path.isabs(imp) else os.path.join(os.path.dirname(p), imp)
            if os.path.exists(full):
                _walk(full)

    _walk(path)
    return list(seen)


def substitute_env(text: str, environment: Mapping[str, str] | None = None) -> str:
    env = os.environ if environment is None else environment

    def _one(m: re.Match[str]) -> str:
        name = m.group(1)
        value = env.get(name)
        if value is None:
            raise ValueError(
                f"missing environment variable: {name} "
                f"(referenced as ${{{name}}})"
            )
        return value

    return ENV_PATTERN.sub(_one, text)


def resolve_date_expression(
    expression: str, fmt: str | None = None, now: datetime | None = None
) -> str:
    """``today``/``now``/``yesterday``/``start_of_month``/
    ``end_of_month``/``start_of_year`` or relative ``±N[dwmy]``;
    optional strftime ``fmt`` (reference :25-113). ``now`` is
    injectable for deterministic tests."""
    now = now or datetime.now()
    midnight = now.replace(hour=0, minute=0, second=0, microsecond=0)
    default_fmt = "%Y-%m-%d"

    if expression == "now":
        return now.strftime(fmt or "%Y-%m-%d %H:%M:%S")
    named = {
        "today": midnight,
        "yesterday": midnight - timedelta(days=1),
        "start_of_month": midnight.replace(day=1),
        "start_of_year": midnight.replace(month=1, day=1),
    }
    if expression == "end_of_month":
        nxt = (
            midnight.replace(year=midnight.year + 1, month=1, day=1)
            if midnight.month == 12
            else midnight.replace(month=midnight.month + 1, day=1)
        )
        return (nxt - timedelta(days=1)).strftime(fmt or default_fmt)
    if expression in named:
        return named[expression].strftime(fmt or default_fmt)

    rel = re.fullmatch(r"([+-]?\d+)([dwmy])", expression)
    if not rel:
        raise ValueError(
            f"unknown date expression '{expression}' — use now/today/"
            "yesterday/start_of_month/end_of_month/start_of_year or ±N[dwmy]"
        )
    amount, unit = int(rel.group(1)), rel.group(2)
    if unit == "d":
        result = midnight + timedelta(days=amount)
    elif unit == "w":
        result = midnight + timedelta(weeks=amount)
    elif unit == "m":
        total = (midnight.year * 12 + midnight.month - 1) + amount
        year, month0 = divmod(total, 12)
        try:
            result = midnight.replace(year=year, month=month0 + 1)
        except ValueError:  # day overflow (Jan 31 + 1m) → last day of month
            nxt = (
                midnight.replace(year=year + 1, month=1, day=1)
                if month0 + 1 == 12
                else midnight.replace(year=year, month=month0 + 2, day=1)
            )
            result = nxt - timedelta(days=1)
    else:  # years
        try:
            result = midnight.replace(year=midnight.year + amount)
        except ValueError:  # Feb 29 → Feb 28
            result = midnight.replace(year=midnight.year + amount, day=28)
    return result.strftime(fmt or default_fmt)


def _substitute_vars(obj: Any, variables: dict[str, Any]) -> Any:
    if isinstance(obj, str):
        full = VARS_PATTERN.fullmatch(obj)
        if full:
            name = full.group(1)
            if name not in variables:
                raise ValueError(
                    f"${{vars.{name}}} is not defined in the vars: block; "
                    f"available: {sorted(variables)}"
                )
            return variables[name]

        def _one(m: re.Match[str]) -> str:
            name = m.group(1)
            if name not in variables:
                raise ValueError(
                    f"${{vars.{name}}} is not defined in the vars: block; "
                    f"available: {sorted(variables)}"
                )
            return str(variables[name])

        return VARS_PATTERN.sub(_one, obj)
    if isinstance(obj, dict):
        return {k: _substitute_vars(v, variables) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute_vars(v, variables) for v in obj]
    return obj


def _substitute_dates(obj: Any, now: datetime | None) -> Any:
    if isinstance(obj, str):
        return DATE_PATTERN.sub(
            lambda m: resolve_date_expression(m.group(1), m.group(2), now=now),
            obj,
        )
    if isinstance(obj, dict):
        return {k: _substitute_dates(v, now) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute_dates(v, now) for v in obj]
    return obj


def _deep_merge(base: dict[str, Any], override: dict[str, Any]) -> dict[str, Any]:
    """dicts recurse, ``pipelines`` lists append, all else: override
    wins (reference :275-330, semantic special-case folded into the
    plain dict rule)."""
    out = dict(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        elif (
            key == "pipelines"
            and isinstance(value, list)
            and isinstance(out.get(key), list)
        ):
            out[key] = out[key] + value
        else:
            out[key] = value
    return out


def load_config(
    path_or_text: str,
    *,
    env: str | None = None,
    environment: Mapping[str, str] | None = None,
    now: datetime | None = None,
    _defer_substitution: bool = False,
) -> dict[str, Any]:
    """Load a pipeline/project YAML into a plain dict with the full
    substitution pipeline applied. Accepts a filesystem path or a YAML
    string (imports and env.<env>.yaml need a real path to resolve
    relative files)."""
    import yaml

    base_dir = None
    text = path_or_text
    if os.path.exists(path_or_text):
        base_dir = os.path.dirname(os.path.abspath(path_or_text))
        with open(path_or_text, encoding="utf-8") as f:
            text = f.read()

    data = yaml.safe_load(substitute_env(text, environment)) or {}
    if not isinstance(data, dict):
        raise ValueError("top-level YAML must be a mapping")

    imports = data.pop("imports", [])
    if isinstance(imports, str):
        imports = [imports]
    for import_path in imports:
        if not os.path.isabs(import_path):
            if base_dir is None:
                raise ValueError(
                    f"relative import '{import_path}' needs the config to "
                    "be loaded from a file path"
                )
            import_path = os.path.join(base_dir, import_path)
        if not os.path.exists(import_path):
            raise FileNotFoundError(f"imported YAML not found: {import_path}")
        imported = load_config(
            import_path, env=env, environment=environment,
            _defer_substitution=True,
        )
        data = _deep_merge(data, imported)

    if env:
        override = (data.get("environments") or {}).get(env)
        if override:
            data = _deep_merge(data, override)
        if base_dir is not None:
            env_file = os.path.join(base_dir, f"env.{env}.yaml")
            if os.path.exists(env_file):
                data = _deep_merge(
                    data,
                    load_config(
                        env_file, environment=environment,
                        _defer_substitution=True,
                    ),
                )
    data.pop("environments", None)

    if not _defer_substitution:
        variables = data.pop("vars", None) or {}
        if variables:
            data = _substitute_vars(data, variables)
        data = _substitute_dates(data, now)
    return data
