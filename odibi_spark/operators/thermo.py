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


# psychrometrics (humid air) backend:
# ha_backend(prop, dry_bulb_k: pd.Series, pressure_pa: pd.Series,
#            second_key: str, second: pd.Series) -> pd.Series
_HA_BACKEND: Callable[..., pd.Series] | None = None

try:  # pragma: no cover — CoolProp present only on a real cluster
    from CoolProp.CoolProp import HAPropsSI  # type: ignore

    def _coolprop_ha_backend(prop, dry_bulb_k, pressure_pa, second_key, second):
        return pd.Series(
            [
                HAPropsSI(prop, "T", t, "P", p, second_key, s)
                for t, p, s in zip(dry_bulb_k, pressure_pa, second)
            ]
        )

    _HA_BACKEND = _coolprop_ha_backend
except ImportError:
    pass


def register_ha_backend(fn: Callable[..., pd.Series]) -> None:
    global _HA_BACKEND
    _HA_BACKEND = fn


# standard atmosphere pressure from elevation (reference
# thermodynamics.py elevation handling): p = 101325 * (1 - 2.25577e-5*h)^5.25588
def _elevation_to_pa(elevation_m: float) -> float:
    return 101325.0 * (1.0 - 2.25577e-5 * elevation_m) ** 5.25588


@transform("psychrometrics")
def psychrometrics(
    ctx: EngineContext,
    *,
    properties: list[str],
    dry_bulb_col: str,
    relative_humidity_col: str | None = None,
    humidity_ratio_col: str | None = None,
    pressure_col: str | None = None,
    elevation_m: float = 0.0,
    temperature_unit: str = "K",
    rh_is_percent: bool = False,
    output_prefix: str = "psy_",
) -> EngineContext:
    """Humid-air properties via CoolProp ``HAPropsSI`` (reference
    thermodynamics.py:676-1048, Spark Pandas-UDF path :990-1048).

    ``properties`` use CoolProp humid-air keys (W humidity ratio,
    B wet bulb, D dew point, H enthalpy, V specific volume, R relative
    humidity). Second state variable is RH (``relative_humidity_col``,
    0-1 or percent) or humidity ratio (``humidity_ratio_col``).
    Pressure comes from ``pressure_col`` (Pa) or the standard
    atmosphere at ``elevation_m``. Vectorized Pandas UDF over Arrow
    batches; backend injectable like ``fluid_properties``."""
    if _HA_BACKEND is None:
        raise NotImplementedError(
            "no psychrometric backend available: install CoolProp or call "
            "odibi_spark.operators.thermo.register_ha_backend(fn)"
        )
    if bool(relative_humidity_col) == bool(humidity_ratio_col):
        raise ValueError(
            "give exactly one of relative_humidity_col / humidity_ratio_col"
        )
    backend = _HA_BACKEND
    second_col = relative_humidity_col or humidity_ratio_col
    second_key = "R" if relative_humidity_col else "W"
    rh_scale = 0.01 if (relative_humidity_col and rh_is_percent) else 1.0
    t_unit = temperature_unit.upper()
    default_pa = _elevation_to_pa(elevation_m)
    fields = [T.StructField(p, T.DoubleType()) for p in properties]

    @F.pandas_udf(T.StructType(fields))
    def ha_udf(t: pd.Series, second: pd.Series, pressure: pd.Series) -> pd.DataFrame:
        if t_unit in ("C", "DEGC"):
            t_k = t + 273.15
        elif t_unit in ("F", "DEGF"):
            t_k = (t - 32.0) * 5.0 / 9.0 + 273.15
        else:
            t_k = t
        return pd.DataFrame(
            {
                prop: backend(prop, t_k, pressure, second_key, second * rh_scale)
                for prop in properties
            }
        )

    pressure_expr = (
        F.col(pressure_col).cast("double")
        if pressure_col
        else F.lit(default_pa)
    )
    df = ctx.df.withColumn(
        "__ha",
        ha_udf(
            F.col(dry_bulb_col).cast("double"),
            F.col(second_col).cast("double"),
            pressure_expr,
        ),
    )
    for p in properties:
        df = df.withColumn(f"{output_prefix}{p}", F.col(f"__ha.{p}"))
    return ctx.with_df(df.drop("__ha"))


# ---------------------------------------------------------------------------
# Native psychrometrics: no CoolProp, pure column expressions
# ---------------------------------------------------------------------------

def with_psychrometrics_native(
    df,
    *,
    dry_bulb_c_col: str,
    relative_humidity_col: str,
    pressure_pa_col: str | None = None,
    elevation_m: float = 0.0,
    rh_is_percent: bool = False,
    output_prefix: str = "psy_",
):
    """Humid-air properties from published closed-form approximations —
    executable HERE (whole-stage codegen, no Python, no CoolProp),
    where the ``psychrometrics`` transform needs the injected
    ``HAPropsSI`` backend. Accuracy is the published envelope of each
    correlation (engineering-grade, not equation-of-state-grade; keep
    the CoolProp path for certified work):

    - saturation vapor pressure: Magnus form with Alduchov-Eskridge
      (1996) coefficients, |err| < 0.4% over -40..50 degC;
    - dew point: inverted Magnus;
    - humidity ratio W = 0.621945 e / (P - e): ASHRAE Fundamentals
      (2017), eq. 20;
    - moist-air enthalpy h = 1.006 t + W (2501 + 1.86 t) kJ/kg dry
      air: ASHRAE eq. 30;
    - wet bulb: Stull (2011, J. Appl. Meteor. Climatol. 50) regression,
      valid 5-99% RH / -20..50 degC at ~standard pressure,
      |err| ~ 0.3 degC.

    Inputs: dry bulb in degC, RH in [0,1] (or percent), pressure in Pa
    (or the standard atmosphere at ``elevation_m``). Adds
    ``{prefix}svp_pa``, ``{prefix}vp_pa``, ``{prefix}humidity_ratio``,
    ``{prefix}dew_point_c``, ``{prefix}enthalpy_kj_kg``,
    ``{prefix}wet_bulb_c``.
    """
    t = F.col(dry_bulb_c_col).cast("double")
    rh = F.col(relative_humidity_col).cast("double")
    if rh_is_percent:
        rh = rh / F.lit(100.0)
    p = (
        F.col(pressure_pa_col).cast("double")
        if pressure_pa_col
        else F.lit(_elevation_to_pa(elevation_m))
    )
    pre = output_prefix
    svp = F.lit(610.94) * F.exp(F.lit(17.625) * t / (t + F.lit(243.04)))
    df = df.withColumn(f"{pre}svp_pa", svp)
    vp = rh * F.col(f"{pre}svp_pa")
    df = df.withColumn(f"{pre}vp_pa", vp)
    w = F.lit(0.621945) * F.col(f"{pre}vp_pa") / (p - F.col(f"{pre}vp_pa"))
    df = df.withColumn(f"{pre}humidity_ratio", w)
    gamma = F.log(rh) + F.lit(17.625) * t / (F.lit(243.04) + t)
    df = df.withColumn(
        f"{pre}dew_point_c",
        F.lit(243.04) * gamma / (F.lit(17.625) - gamma),
    )
    df = df.withColumn(
        f"{pre}enthalpy_kj_kg",
        F.lit(1.006) * t
        + F.col(f"{pre}humidity_ratio") * (F.lit(2501.0) + F.lit(1.86) * t),
    )
    rp = rh * F.lit(100.0)  # Stull's fit takes RH in percent
    df = df.withColumn(
        f"{pre}wet_bulb_c",
        t * F.atan(F.lit(0.151977) * F.sqrt(rp + F.lit(8.313659)))
        + F.atan(t + rp)
        - F.atan(rp - F.lit(1.676331))
        + F.lit(0.00391838) * F.pow(rp, F.lit(1.5)) * F.atan(F.lit(0.023101) * rp)
        - F.lit(4.686035),
    )
    return df


@transform("psychrometrics_native")
def psychrometrics_native(
    ctx: EngineContext,
    *,
    dry_bulb_col: str,
    relative_humidity_col: str,
    pressure_col: str | None = None,
    elevation_m: float = 0.0,
    rh_is_percent: bool = False,
    output_prefix: str = "psy_",
) -> EngineContext:
    """YAML surface: closed-form psychrometrics (dry bulb degC + RH)."""
    return ctx.with_df(
        with_psychrometrics_native(
            ctx.df,
            dry_bulb_c_col=dry_bulb_col,
            relative_humidity_col=relative_humidity_col,
            pressure_pa_col=pressure_col,
            elevation_m=elevation_m,
            rh_is_percent=rh_is_percent,
            output_prefix=output_prefix,
        )
    )
