"""Spatial near-join — radius matching of two point sets without a
cross join.

Beyond-reference addition (the reference's only spatial surface is a
pass-through geocode stub, odibi/transformers/advanced.py:1001-1027):
the "customers within R of a site" workload.

Plan shape: the same bucketize-then-refine discipline as the LSH /
band / anchor joins. Both sides land on a fixed integer grid of
``radius``-sized cells (degrees latitude); the RIGHT side (pick the
smaller set) explodes to its neighborhood of cells, candidates come
from ONE equi-join on (cell_x, cell_y), and only those pairs pay the
haversine. Cost = bucket density x neighborhood size — never |L|x|R|.

Longitude degrees shrink with cos(latitude), so the neighborhood is
±1 cell in latitude and ±(ceil(dlng_max/cell)+1) cells in longitude
(the +1 covers the narrower antimeridian seam cell) — bounded only
when ``max_abs_lat`` keeps cos away from 0 (default 60°: lng span 4,
neighborhood 3x9 = 27 cells). Polar data needs a polar-cap special
case; this operator refuses latitudes beyond the configured band
rather than silently losing matches.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from odibi_spark.context import EngineContext
from odibi_spark.registry import transform

EARTH_R_M = 6371000.0
# meters per degree of latitude on the R=6371 km sphere (R * pi/180) —
# NOT the 111320 equatorial-circumference figure: haversine distances
# use the sphere, and an undersized cell makes blocking lose matches
M_PER_DEG_LAT = EARTH_R_M * math.pi / 180.0


def haversine_m(lat1, lng1, lat2, lng2):
    """Great-circle distance in meters between two (lat, lng) column
    pairs (degrees). Pure JVM expressions — codegen'd."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlng = F.radians(lng2 - lng1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlng) * F.sin(dlng)
    )
    return F.lit(2.0 * EARTH_R_M) * F.asin(F.sqrt(a))


def grid_near_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lat: str,
    left_lng: str,
    right_lat: str,
    right_lng: str,
    radius_m: float,
    max_abs_lat: float = 60.0,
    distance_col: str = "distance_m",
) -> DataFrame:
    """Pairs (left, right) within ``radius_m`` meters, via grid
    blocking + haversine refine. Right-side column collisions are
    suffixed ``_r``. Rows beyond ``max_abs_lat`` raise at plan level —
    widen the band (cost: wider longitude neighborhood) or handle
    poles separately."""
    cell_deg = float(radius_m) / M_PER_DEG_LAT
    # worst-case spans from the SPHERICAL formulas, not planar
    # approximations. Latitude: a radius_m arc along a meridian is
    # exactly radius_m/R radians = one cell by construction -> +-1.
    # Longitude: both points at max_abs_lat, haversine inverted:
    # dlng = 2*asin(sin(d/2R)/cos(lat)) — slightly MORE than the
    # planar radius/(m_per_deg*cos(lat)) (2.0016 cells at 60 deg /
    # 500 km, where the planar bound of 2 loses boundary pairs).
    sin_half = math.sin(float(radius_m) / (2.0 * EARTH_R_M))
    cos_lat = math.cos(math.radians(max_abs_lat))
    if sin_half >= cos_lat:
        raise ValueError(
            f"radius {radius_m} m spans the polar cap at "
            f"max_abs_lat={max_abs_lat}; shrink the band or the radius"
        )
    dlng_max_deg = math.degrees(2.0 * math.asin(sin_half / cos_lat))
    # +1: longitude cells WRAP at the antimeridian (a pair at 179.9 /
    # -179.9 deg is 0.2 deg apart); the circle rarely divides evenly,
    # so the seam cell is narrower and inflates index distance by <= 1
    lng_span = math.ceil(dlng_max_deg / cell_deg) + 1
    n_lng_cells = math.ceil(360.0 / cell_deg)

    r2 = right
    renames = {}
    for c in right.columns:
        if c in left.columns:
            r2 = r2.withColumnRenamed(c, c + "_r")
            renames[c] = c + "_r"
    rlat = renames.get(right_lat, right_lat)
    rlng = renames.get(right_lng, right_lng)

    def guard(df, lat_col):
        # refuse out-of-band latitudes loudly instead of losing matches
        bad = F.abs(F.col(lat_col)) > F.lit(max_abs_lat)
        return df.withColumn(
            lat_col,
            F.when(
                bad,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"grid_near_join: |{lat_col}| exceeds the "
                            f"{max_abs_lat} deg band: "
                        ),
                        F.col(lat_col).cast("string"),
                    )
                ).cast("double"),
            ).otherwise(F.col(lat_col)),
        )

    def lng_cell(col):
        # [0, 360) indexing so the floor is non-negative pre-wrap
        return F.floor((col + F.lit(180.0)) / F.lit(cell_deg))

    lcell = guard(left, left_lat).withColumn(
        "__cx", F.floor(F.col(left_lat) / F.lit(cell_deg))
    ).withColumn(
        "__cy", F.pmod(lng_cell(F.col(left_lng)), F.lit(n_lng_cells))
    )
    rcell = (
        guard(r2, rlat)
        .withColumn("__bx", F.floor(F.col(rlat) / F.lit(cell_deg)))
        .withColumn("__by", lng_cell(F.col(rlng)))
        .withColumn("__dx", F.expr("explode(sequence(-1, 1))"))
        .withColumn(
            "__dy", F.expr(f"explode(sequence({-lng_span}, {lng_span}))")
        )
        .withColumn("__cx", F.col("__bx") + F.col("__dx"))
        .withColumn(
            "__cy",
            F.pmod(F.col("__by") + F.col("__dy"), F.lit(n_lng_cells)),
        )
        .drop("__bx", "__by", "__dx", "__dy")
    )
    cands = lcell.join(rcell, ["__cx", "__cy"]).drop("__cx", "__cy")
    dist = haversine_m(
        F.col(left_lat), F.col(left_lng), F.col(rlat), F.col(rlng)
    )
    return cands.withColumn(distance_col, dist).filter(
        F.col(distance_col) <= F.lit(float(radius_m))
    )


@transform("spatial_near_join")
def spatial_near_join(
    ctx: EngineContext,
    *,
    right: str | DataFrame,
    left_lat: str,
    left_lng: str,
    right_lat: str,
    right_lng: str,
    radius_m: float,
    max_abs_lat: float = 60.0,
) -> EngineContext:
    """YAML surface: radius join against another point set (a
    registered dataset name or a DataFrame, like every join
    transform)."""
    from odibi_spark.operators.relational import _resolve_right

    return ctx.with_df(
        grid_near_join(
            ctx.df, _resolve_right(ctx, right), left_lat=left_lat,
            left_lng=left_lng, right_lat=right_lat, right_lng=right_lng,
            radius_m=radius_m, max_abs_lat=max_abs_lat,
        )
    )
