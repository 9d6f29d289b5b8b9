"""Reusable node templates ("recipes") with variable substitution.

Parity target (reference: odibi/recipes/__init__.py:1-383): a
``recipes:`` block defines named partial node configurations; a node
opts in with ``recipe: <name>`` + ``recipe_vars: {...}``. Semantics
kept from the reference:

- ``${recipe.var}`` placeholders substitute recursively through the
  template; when a scalar is EXACTLY one placeholder the variable's
  original type is preserved (lists/ints pass through), otherwise the
  value is stringified into the surrounding text (reference :220-260).
- ``extends`` chains deep-merge parent templates (child wins), union
  required_vars, and overlay optional_vars; cycles and unknown parents
  are errors (reference :166-216).
- Merge precedence at the node: template is the base, explicit node
  fields win; dicts merge recursively, lists and scalars are replaced
  whole (reference :262-280).
- Templates may not set ``name`` / ``recipe`` / ``recipe_vars`` —
  those belong to the node (reference RESERVED_NODE_FIELDS :47-55).

Resolution is a pure dict→dict pass applied after ``yaml.safe_load``
and before pydantic validation, so an expanded node goes through the
same StrictModel typo-detection as a hand-written one.
"""

from __future__ import annotations

import copy
import re
from typing import Any

from pydantic import BaseModel, ConfigDict, model_validator

_VAR = re.compile(r"\$\{recipe\.([A-Za-z_][A-Za-z0-9_]*)\}")

#: fields a template may not set — they identify the node itself
RESERVED_NODE_FIELDS = frozenset({"name", "recipe", "recipe_vars"})


class Recipe(BaseModel):
    model_config = ConfigDict(extra="forbid")

    description: str | None = None
    extends: str | None = None
    required_vars: list[str] = []
    optional_vars: dict[str, Any] = {}
    template: dict[str, Any]

    @model_validator(mode="after")
    def _no_reserved_fields(self) -> "Recipe":
        bad = RESERVED_NODE_FIELDS & set(self.template)
        if bad:
            raise ValueError(
                f"recipe template may not set node-identity field(s) "
                f"{sorted(bad)} — they belong to the node"
            )
        return self


#: Built-in recipes, adapted to this repo's operator names (reference
#: ships bronze/silver/gold builtin YAML: odibi/recipes/builtins/).
#: Inline recipes with the same name override these.
BUILTIN_RECIPES: dict[str, dict[str, Any]] = {
    "bronze_ingest": {
        "description": "Raw file → parquet with normalized column "
        "names and write-lineage metadata columns.",
        "required_vars": ["source_format", "target_path"],
        "optional_vars": {"write_mode": "append"},
        "template": {
            "read": {"format": "${recipe.source_format}"},
            "transform": [{"function": "normalize_column_names", "params": {}}],
            "write": {
                "path": "${recipe.target_path}",
                "mode": "${recipe.write_mode}",
                "add_metadata": True,
            },
        },
    },
    "silver_dedup_latest": {
        "description": "Keep the latest row per business key "
        "(row_number over keys ordered by a recency column).",
        "required_vars": ["keys", "order_by", "target_path"],
        "template": {
            "transform": [
                {
                    "function": "deduplicate",
                    "params": {
                        "keys": "${recipe.keys}",
                        "order_by": "${recipe.order_by}",
                        "descending": True,
                    },
                }
            ],
            "write": {"path": "${recipe.target_path}", "mode": "overwrite"},
        },
    },
    "gold_aggregate": {
        "description": "Grain + measures aggregation for a reporting "
        "table (declarative aggregate operator).",
        "required_vars": ["grain", "measures", "target_path"],
        "template": {
            "transform": [
                {
                    "function": "aggregate",
                    "params": {
                        "group_by": "${recipe.grain}",
                        "aggregations": "${recipe.measures}",
                    },
                }
            ],
            "write": {"path": "${recipe.target_path}", "mode": "overwrite"},
        },
    },
}


def _substitute(obj: Any, variables: dict[str, Any], recipe_name: str) -> Any:
    """Replace ``${recipe.var}`` through strings/dicts/lists.

    A full-match placeholder returns the variable verbatim (type
    preserved); an embedded one stringifies. Unknown variables raise.
    """
    if isinstance(obj, str):
        full = _VAR.fullmatch(obj)
        if full:
            name = full.group(1)
            if name not in variables:
                raise ValueError(
                    f"recipe '{recipe_name}': ${{recipe.{name}}} has no "
                    f"value; available: {sorted(variables)}"
                )
            return variables[name]

        def _one(m: re.Match[str]) -> str:
            name = m.group(1)
            if name not in variables:
                raise ValueError(
                    f"recipe '{recipe_name}': ${{recipe.{name}}} has no "
                    f"value; available: {sorted(variables)}"
                )
            return str(variables[name])

        return _VAR.sub(_one, obj)
    if isinstance(obj, dict):
        return {k: _substitute(v, variables, recipe_name) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute(v, variables, recipe_name) for v in obj]
    return obj


def _deep_merge(base: dict[str, Any], override: dict[str, Any]) -> dict[str, Any]:
    """dict+dict merge recursively; lists/scalars: override replaces."""
    out = copy.deepcopy(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def _resolve_extends(recipes: dict[str, Recipe]) -> dict[str, Recipe]:
    resolved: dict[str, Recipe] = {}

    def resolve(name: str, chain: tuple[str, ...]) -> Recipe:
        if name in resolved:
            return resolved[name]
        if name in chain:
            cycle = " -> ".join(chain + (name,))
            raise ValueError(f"circular recipe inheritance: {cycle}")
        recipe = recipes[name]
        if recipe.extends is None:
            resolved[name] = recipe
            return recipe
        if recipe.extends not in recipes:
            raise ValueError(
                f"recipe '{name}' extends unknown recipe '{recipe.extends}'"
            )
        parent = resolve(recipe.extends, chain + (name,))
        merged = Recipe(
            description=recipe.description or parent.description,
            extends=None,
            required_vars=(
                [v for v in parent.required_vars if v not in recipe.required_vars]
                + recipe.required_vars
            ),
            optional_vars={**parent.optional_vars, **recipe.optional_vars},
            template=_deep_merge(parent.template, recipe.template),
        )
        resolved[name] = merged
        return merged

    for name in recipes:
        resolve(name, ())
    return resolved


def _expand_node(node: dict[str, Any], recipes: dict[str, Recipe]) -> dict[str, Any]:
    name = node.get("recipe")
    node_name = node.get("name", "<unnamed>")
    if name not in recipes:
        raise ValueError(
            f"node '{node_name}': unknown recipe '{name}'; "
            f"available: {sorted(recipes)}"
        )
    recipe = recipes[name]
    variables = dict(recipe.optional_vars)
    recipe_vars = node.get("recipe_vars") or {}
    if not isinstance(recipe_vars, dict):
        raise ValueError(f"node '{node_name}': recipe_vars must be a mapping")
    variables.update(recipe_vars)
    missing = [v for v in recipe.required_vars if v not in variables]
    if missing:
        raise ValueError(
            f"node '{node_name}': recipe '{name}' requires {missing}; "
            f"provided: {sorted(recipe_vars)}"
        )
    template = _substitute(copy.deepcopy(recipe.template), variables, name)
    overrides = {k: v for k, v in node.items() if k not in ("recipe", "recipe_vars")}
    return _deep_merge(template, overrides)


def load_recipes(inline: dict[str, Any] | None = None) -> dict[str, Recipe]:
    """Built-ins overlaid with inline definitions, extends resolved."""
    recipes: dict[str, Recipe] = {}
    for name, data in BUILTIN_RECIPES.items():
        recipes[name] = Recipe.model_validate(data)
    for name, data in (inline or {}).items():
        try:
            recipes[name] = Recipe.model_validate(data)
        except Exception as exc:
            raise ValueError(f"invalid recipe '{name}': {exc}") from exc
    return _resolve_extends(recipes)


def resolve_recipes(doc: Any) -> Any:
    """Expand every ``recipe:`` node in a pipeline or project dict.

    Accepts the raw ``yaml.safe_load`` output for either shape —
    ``{name, nodes: [...]}`` (pipeline) or ``{name, pipelines: [...]}``
    (project) — consumes the top-level ``recipes:`` block, and returns
    a new dict ready for pydantic validation. Non-dict input and docs
    without recipes/recipe nodes pass through unchanged.
    """
    if not isinstance(doc, dict):
        return doc
    uses_recipe = any(
        isinstance(n, dict) and "recipe" in n
        for p in ([doc] if "nodes" in doc else doc.get("pipelines") or [])
        if isinstance(p, dict)
        for n in p.get("nodes") or []
    )
    if "recipes" not in doc and not uses_recipe:
        return doc
    doc = copy.deepcopy(doc)
    recipes = load_recipes(doc.pop("recipes", None))

    def expand_all(pipeline: dict[str, Any]) -> None:
        nodes = pipeline.get("nodes")
        if not isinstance(nodes, list):
            return
        pipeline["nodes"] = [
            _expand_node(n, recipes)
            if isinstance(n, dict) and "recipe" in n
            else n
            for n in nodes
        ]

    if "nodes" in doc:
        expand_all(doc)
    for pipeline in doc.get("pipelines") or []:
        if isinstance(pipeline, dict):
            expand_all(pipeline)
    return doc
