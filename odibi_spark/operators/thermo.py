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


# ---------------------------------------------------------------------------
# Saturation properties (reference: odibi/transformers/thermodynamics.py
# :560-656 SaturationPropertiesParams + saturation_properties — CoolProp
# PropsSI at quality Q=0/1). Registered under the SAME name so a YAML
# pipeline ported from the reference resolves (VERDICT r9 task 3).
# ---------------------------------------------------------------------------

# saturation backend: (fluid, prop, phase, key 'T'|'P', values_si:
# pd.Series) -> pd.Series, all SI (K / Pa / J/kg)
_SAT_BACKEND: Callable[..., pd.Series] | None = None

try:  # pragma: no cover — CoolProp present only on a real cluster
    from CoolProp.CoolProp import PropsSI as _PropsSI  # type: ignore

    def _coolprop_sat_backend(fluid, prop, phase, key, values):
        q = 0.0 if phase == "liquid" else 1.0
        return pd.Series([_PropsSI(prop, key, v, "Q", q, fluid) for v in values])

    _SAT_BACKEND = _coolprop_sat_backend
except ImportError:
    pass


def register_sat_backend(fn: Callable[..., pd.Series]) -> None:
    global _SAT_BACKEND
    _SAT_BACKEND = fn


_PSI_PA = 6894.757293168
_P_TO_PA = {
    "pa": 1.0, "kpa": 1e3, "mpa": 1e6, "bar": 1e5,
    "atm": 101325.0, "psia": _PSI_PA, "psi": _PSI_PA,
}
_H_FROM_J_KG = {"j/kg": 1.0, "kj/kg": 1e-3, "btu/lb": 1.0 / 2326.0}


def _pressure_to_pa(col, unit: str, gauge_offset: float):
    u = unit.lower()
    if u == "psig":  # reference gauge handling: (v + offset) psia
        return (col + F.lit(float(gauge_offset))) * F.lit(_PSI_PA)
    if u in _P_TO_PA:
        return col * F.lit(_P_TO_PA[u])
    raise ValueError(f"unsupported pressure unit '{unit}'")


def _temperature_to_k(col, unit: str):
    u = unit.upper()
    if u in ("C", "DEGC"):
        return col + F.lit(273.15)
    if u in ("F", "DEGF"):
        return (col - F.lit(32.0)) * F.lit(5.0 / 9.0) + F.lit(273.15)
    if u == "K":
        return col
    raise ValueError(f"unsupported temperature unit '{unit}'")


# IAPWS-IF97 region-4 saturation equations (Wagner & Pruss / IAPWS
# R7-97(2012), eqs. 30-31): closed-form quartic-root formulation valid
# 273.15-647.096 K with <0.02% deviation from steam tables and an
# EXACT psat<->Tsat round trip — pure column expressions, whole-stage
# codegen, no CoolProp.
_IF97_N = (
    0.11670521452767e4, -0.72421316703206e6, -0.17073846940092e2,
    0.12020824702470e5, -0.32325550322333e7, 0.14915108613530e2,
    -0.48232657361591e4, 0.40511340542057e6, -0.23855557567849,
    0.65017534844798e3,
)


def _water_psat_pa(t_k):
    n = _IF97_N
    th = t_k + F.lit(n[8]) / (t_k - F.lit(n[9]))
    a = th * th + F.lit(n[0]) * th + F.lit(n[1])
    b = F.lit(n[2]) * th * th + F.lit(n[3]) * th + F.lit(n[4])
    c = F.lit(n[5]) * th * th + F.lit(n[6]) * th + F.lit(n[7])
    root = (F.lit(2.0) * c) / (
        -b + F.sqrt(b * b - F.lit(4.0) * a * c)
    )
    return F.pow(root, F.lit(4.0)) * F.lit(1e6)


def _water_tsat_k(p_pa):
    n = _IF97_N
    beta = F.pow(p_pa / F.lit(1e6), F.lit(0.25))
    e = beta * beta + F.lit(n[2]) * beta + F.lit(n[5])
    f = F.lit(n[0]) * beta * beta + F.lit(n[3]) * beta + F.lit(n[6])
    g = F.lit(n[1]) * beta * beta + F.lit(n[4]) * beta + F.lit(n[7])
    d = (F.lit(2.0) * g) / (-f - F.sqrt(f * f - F.lit(4.0) * e * g))
    s = F.lit(n[9]) + d
    return (
        s - F.sqrt(s * s - F.lit(4.0) * (F.lit(n[8]) + F.lit(n[9]) * d))
    ) / F.lit(2.0)


def _water_sat_enthalpy_j_kg(t_k, phase: str):
    """hf ~= 4.1868 t kJ/kg (liquid); hg ~= 2501 + 1.84 t kJ/kg
    (vapor), t in degC — the standard engineering approximations
    (ASHRAE-grade below ~150 degC; keep CoolProp for certified work)."""
    t_c = t_k - F.lit(273.15)
    if phase == "liquid":
        return F.lit(4186.8) * t_c
    return (F.lit(2501.0) + F.lit(1.84) * t_c) * F.lit(1000.0)


@transform("saturation_properties")
def saturation_properties(
    ctx: EngineContext,
    *,
    fluid: str = "Water",
    phase: str = "vapor",
    pressure_col: str | None = None,
    pressure: float | None = None,
    temperature_col: str | None = None,
    temperature: float | None = None,
    pressure_unit: str = "Pa",
    temperature_unit: str = "K",
    gauge_offset: float = 14.696,
    outputs: list[dict] | None = None,
    properties: list[str] | None = None,
    prefix: str = "sat_",
) -> EngineContext:
    """Saturated liquid (Q=0) / vapor (Q=1) properties — the reference's
    convenience wrapper (thermodynamics.py:631-656: sets quality from
    ``phase`` and delegates to fluid_properties), same registered name
    and parameter surface (pressure OR temperature, col or fixed;
    psig gauge offset; per-output unit + output_column).

    Two execution paths:
    - a registered saturation backend (CoolProp ``PropsSI(prop, key,
      v, 'Q', q, fluid)`` auto-registers; ``register_sat_backend`` for
      anything else) runs as a vectorized Pandas UDF over Arrow
      batches — any fluid, any property key;
    - WITHOUT a backend, fluid='Water' with properties in {T, P, H}
      takes a closed-form whole-stage-codegen path: IAPWS-IF97
      region-4 saturation equations (<0.02% vs steam tables, exact
      psat<->Tsat round trip) and the standard hf/hg linear
      approximations — pytest-pinned against published steam-table
      values, zero Python in the executor.

    ``outputs``: reference-style ``[{property, unit, output_column}]``
    (default ``[{property: 'H'}]``); ``properties: [str]`` is the
    house-style sugar. Output units: T in K/degC/degF, P in
    Pa/kPa/bar/psia, H in J/kg / kJ/kg / BTU/lb.
    """
    has_p = pressure_col is not None or pressure is not None
    has_t = temperature_col is not None or temperature is not None
    if not has_p and not has_t:
        raise ValueError(
            "either pressure or temperature must be provided for saturation"
        )
    if has_p and has_t:
        raise ValueError("give pressure OR temperature, not both")
    if phase not in ("liquid", "vapor"):
        raise ValueError(f"phase must be 'liquid' or 'vapor', got '{phase}'")
    if properties and outputs:
        raise ValueError("give outputs OR properties, not both")
    specs = (
        [{"property": p} for p in properties]
        if properties
        else (outputs or [{"property": "H"}])
    )

    if has_p:
        raw = (
            F.col(pressure_col).cast("double")
            if pressure_col
            else F.lit(float(pressure))
        )
        key, key_si = "P", _pressure_to_pa(raw, pressure_unit, gauge_offset)
    else:
        raw = (
            F.col(temperature_col).cast("double")
            if temperature_col
            else F.lit(float(temperature))
        )
        key, key_si = "T", _temperature_to_k(raw, temperature_unit)

    df = ctx.df.withColumn("__sat_key", key_si)

    def out_name(spec: dict) -> str:
        return spec.get("output_column") or f"{prefix}{spec['property']}"

    def convert(col, prop: str, unit: str | None):
        if not unit:
            return col
        u = unit.lower()
        if prop == "T":
            if u in ("k",):
                return col
            if u in ("c", "degc"):
                return col - F.lit(273.15)
            if u in ("f", "degf"):
                return (col - F.lit(273.15)) * F.lit(9.0 / 5.0) + F.lit(32.0)
        elif prop == "P":
            if u in _P_TO_PA:
                return col / F.lit(_P_TO_PA[u])
        elif u in _H_FROM_J_KG:
            return col * F.lit(_H_FROM_J_KG[u])
        raise ValueError(f"unsupported output unit '{unit}' for {prop}")

    if _SAT_BACKEND is not None:
        backend, fl, ph, k_ = _SAT_BACKEND, fluid, phase, key
        fields = [
            T.StructField(s["property"], T.DoubleType()) for s in specs
        ]

        @F.pandas_udf(T.StructType(fields))
        def sat_udf(v: pd.Series) -> pd.DataFrame:
            return pd.DataFrame(
                {s["property"]: backend(fl, s["property"], ph, k_, v)
                 for s in specs}
            )

        df = df.withColumn("__sat", sat_udf(F.col("__sat_key")))
        for s in specs:
            df = df.withColumn(
                out_name(s),
                convert(F.col(f"__sat.{s['property']}"), s["property"],
                        s.get("unit")),
            )
        return ctx.with_df(df.drop("__sat", "__sat_key"))

    if fluid.lower() != "water":
        raise NotImplementedError(
            f"no saturation backend available for fluid '{fluid}': install "
            "CoolProp or call odibi_spark.operators.thermo."
            "register_sat_backend(fn); the built-in closed-form path "
            "covers Water only"
        )
    unsupported = [s["property"] for s in specs if s["property"] not in
                   ("T", "P", "H")]
    if unsupported:
        raise NotImplementedError(
            f"closed-form Water path supports properties T/P/H, got "
            f"{unsupported}: install CoolProp or register_sat_backend(fn)"
        )
    t_k = F.col("__sat_key") if key == "T" else _water_tsat_k(F.col("__sat_key"))
    p_pa = F.col("__sat_key") if key == "P" else _water_psat_pa(F.col("__sat_key"))
    si = {"T": t_k, "P": p_pa, "H": _water_sat_enthalpy_j_kg(t_k, phase)}
    for s in specs:
        df = df.withColumn(
            out_name(s), convert(si[s["property"]], s["property"], s.get("unit"))
        )
    return ctx.with_df(df.drop("__sat_key"))
