"""Operator library. Importing this package registers every named
operator in the global FunctionRegistry (reference:
odibi/transformers/__init__.py:24-152 registers ~45 ops by name)."""

from odibi_spark.operators import (  # noqa: F401
    advanced,
    analytics,
    fuzzy,
    layout,
    manufacturing,
    rank,
    relational,
    runtime_filter,
    skew,
    spatial,
    sql_core,
    temporal_join,
    thermo,
    units,
    window,
)
