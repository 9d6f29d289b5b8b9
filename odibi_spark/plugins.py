"""Plugin loading (reference: odibi/plugins.py:22-80 — connection
factories via entry points; odibi/__init__.py:27-30 @transform
decorator; docs/guides/custom_functions.md module loading).

Two extension surfaces, both registries the core already dispatches on:

- transforms: ``@odibi_spark.registry.transform("name")`` registers a
  named operator usable from YAML ``function:`` steps.
- connections: ``register_connection_factory("type", fn)`` registers a
  connection type usable from YAML ``connections:``.

``load_plugin_module`` imports a dotted module so its decorators run;
``load_entry_point_plugins`` picks up installed packages advertising
``odibi_spark.plugins`` entry points.
"""

from __future__ import annotations

import importlib
from typing import Iterable

from odibi_spark.connections import register_connection_factory  # noqa: F401  (re-export)

__all__ = [
    "register_connection_factory",
    "load_plugin_module",
    "load_plugins",
    "load_entry_point_plugins",
]


def load_plugin_module(dotted: str):
    """Import a plugin module (its registration decorators run on import).

    Returns the module; raises ImportError with the module name preserved.
    """
    return importlib.import_module(dotted)


def load_plugins(modules: Iterable[str]) -> list:
    """Import each dotted module in order; returns the modules."""
    return [load_plugin_module(m) for m in modules]


def load_entry_point_plugins(group: str = "odibi_spark.plugins") -> list:
    """Load plugins advertised by installed packages' entry points.

    Each entry point is loaded and, if callable, called with no args
    (the conventional ``def register(): ...`` hook).
    """
    from importlib.metadata import entry_points

    loaded = []
    try:
        eps = entry_points(group=group)
    except TypeError:  # older API: entry_points() -> dict
        eps = entry_points().get(group, [])
    for ep in eps:
        obj = ep.load()
        if callable(obj):
            obj()
        loaded.append(obj)
    return loaded
