"""Named-operator registry + public ``@transform`` decorator.

Reproduces the reference's FunctionRegistry contract (reference:
odibi/registry.py:1-269, dispatch odibi/node.py:1693-1741): operators
are looked up by name and invoked as ``fn(EngineContext, **params) ->
EngineContext | DataFrame``. Users extend the engine with
``@transform`` (reference: odibi/__init__.py:27-30).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from odibi_spark.context import EngineContext


class FunctionRegistry:
    def __init__(self) -> None:
        self._functions: dict[str, Callable[..., Any]] = {}

    def register(self, name: str, fn: Callable[..., Any]) -> None:
        if name in self._functions:
            raise ValueError(f"transformer '{name}' already registered")
        self._functions[name] = fn

    def get(self, name: str) -> Callable[..., Any]:
        try:
            return self._functions[name]
        except KeyError:
            known = ", ".join(sorted(self._functions))
            raise KeyError(f"unknown transformer '{name}'. Known: {known}") from None

    def has(self, name: str) -> bool:
        return name in self._functions

    def list(self) -> list[str]:
        return sorted(self._functions)

    def apply(self, name: str, ctx: EngineContext, params: dict[str, Any]) -> EngineContext:
        """Invoke a named operator; normalize DataFrame returns to EngineContext."""
        out = self.get(name)(ctx, **params)
        if isinstance(out, DataFrame):
            return ctx.with_df(out)
        if isinstance(out, EngineContext):
            return out
        raise TypeError(
            f"transformer '{name}' returned {type(out).__name__}; "
            "expected DataFrame or EngineContext"
        )


_REGISTRY = FunctionRegistry()


def get_registry() -> FunctionRegistry:
    return _REGISTRY


def transform(name: str | None = None) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Decorator registering a user transformer by name.

    Usage::

        @transform()                # registers under the function name
        def my_op(ctx, *, col): ...
    """

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        _REGISTRY.register(name or fn.__name__, fn)
        return fn

    return deco
