"""Thermodynamic property transformer (reference: odibi/transformers/
thermodynamics.py:189-1048 — CoolProp fluid/saturation/psychrometric
properties via a Pandas UDF returning a struct, Spark path :490-549).

CoolProp is not in this container. The Spark-side plumbing is real —
a vectorized Pandas UDF returning a property struct over Arrow batches
— and the property backend is injectable: ``register_backend`` installs
CoolProp (or any callable) on a cluster; without one the operator
raises a clear error at call time, never at import time.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform

# backend(fluid, prop, temps_k: pd.Series, pressures_pa: pd.Series) -> pd.Series
_BACKEND: Callable[..., pd.Series] | None = None

try:  # pragma: no cover — CoolProp present only on a real cluster
    from CoolProp.CoolProp import PropsSI  # type: ignore

    def _coolprop_backend(fluid, prop, temps_k, pressures_pa):
        return pd.Series(
            [PropsSI(prop, "T", t, "P", p, fluid) for t, p in zip(temps_k, pressures_pa)]
        )

    _BACKEND = _coolprop_backend
except ImportError:
    pass


def register_backend(fn: Callable[..., pd.Series]) -> None:
    global _BACKEND
    _BACKEND = fn


@transform("fluid_properties")
def fluid_properties(
    ctx: EngineContext,
    *,
    fluid: str,
    properties: list[str],
    temperature_col: str,
    pressure_col: str,
    output_prefix: str = "prop_",
) -> EngineContext:
    """Adds one column per requested property via a vectorized Pandas
    UDF (Arrow batches; reference returns a struct, :490-549)."""
    if _BACKEND is None:
        raise NotImplementedError(
            "no thermodynamic backend available: install CoolProp or call "
            "odibi_spark.operators.thermo.register_backend(fn)"
        )
    backend = _BACKEND
    fields = [T.StructField(p, T.DoubleType()) for p in properties]

    @F.pandas_udf(T.StructType(fields))
    def props_udf(t: pd.Series, p: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({prop: backend(fluid, prop, t, p) for prop in properties})

    df = ctx.df.withColumn(
        "__props", props_udf(F.col(temperature_col), F.col(pressure_col))
    )
    for p in properties:
        df = df.withColumn(f"{output_prefix}{p}", F.col(f"__props.{p}"))
    return ctx.with_df(df.drop("__props"))
