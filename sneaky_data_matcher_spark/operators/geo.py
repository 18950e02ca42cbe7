"""Geospatial distance join: grid-cell blocking + haversine verification.

Address/location agreement is a staple blocking+scoring signal in record
linkage (the reference's exact-key probe — SearchService.java:165 — has no
spatial tolerance; this adds the standard "within R km" candidate
generator). The scalable pattern is the spatial analogue of blocking_keys:

  1. assign every point to a lat/lon grid cell sized so that any two
     points within `radius_km` are in the same or adjacent cells,
  2. join each point against the 3x3 neighbourhood of its cell
     (map-side explode of 9 offsets — one equi-join, one shuffle on the
     cell key; NO cross join),
  3. verify candidates with the exact haversine distance.

Cell sizing: one degree of latitude is ~110.574 km everywhere; one degree
of longitude is ~111.320*cos(lat) km. Callers bound |lat| <= max_abs_lat
and the lon cell uses the worst-case (widest) degree-span at that
latitude, so the 3x3 stencil provably covers the radius. Longitude
wrap-around at the antimeridian is NOT stitched (cells -180 and +180 are
not adjacent); keep data within (-180+span, 180-span) or pre-rotate.

Scale shape (100 TB): candidate volume is bounded by local density x 9
cells, not n^2; the only shuffle is the cell-key equi-join, and skew from
dense cities is exactly the hot-block problem blocking.salt_keys already
solves (compose if needed).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 110.574
KM_PER_DEG_LON_EQ = 111.320


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine form, double precision)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon / 2), 2)
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def cell_sizes_deg(radius_km: float, max_abs_lat: float = 60.0) -> tuple[float, float]:
    """(lat_cell_deg, lon_cell_deg) guaranteeing 3x3-stencil coverage of
    `radius_km` for all points with |lat| <= max_abs_lat."""
    lat_cell = radius_km / KM_PER_DEG_LAT
    lon_cell = radius_km / (KM_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)))
    return lat_cell, lon_cell


def grid_distance_join(
    points: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All unordered point pairs within `radius_km` of each other.

    Output: (id_a, id_b, dist_km) with id_a < id_b, dist_km unrounded.
    Each qualifying pair is emitted exactly once: for a fixed orientation
    the cell-offset between the two points is unique, and the id_a < id_b
    filter keeps one orientation.
    """
    lat_cell, lon_cell = cell_sizes_deg(radius_km, max_abs_lat)
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
        F.floor(F.col(lat_col) / lat_cell).alias("ci"),
        F.floor(F.col(lon_col) / lon_cell).alias("cj"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1,1), di ->"
        " transform(sequence(-1,1), dj -> struct(di, dj)))))"
    )
    probe = pts.select("id", "lat", "lon", "ci", "cj", offsets.alias("o")).select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("ci") + F.col("o.di")).alias("ci"),
        (F.col("cj") + F.col("o.dj")).alias("cj"),
    )
    build = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "ci",
        "cj",
    )
    cand = probe.join(build, ["ci", "cj"]).where(F.col("id_a") < F.col("id_b"))
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return cand.select("id_a", "id_b", dist.alias("dist_km")).where(
        F.col("dist_km") <= radius_km
    )


def grid_distance_join_sql(
    points_rel: str,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
) -> str:
    """DuckDB twin of grid_distance_join as a SELECT over `points_rel`
    (a relation/CTE name with columns id/lat/lon). Identical double
    pipeline: same cell constants (repr round-trips the exact float),
    same stencil, same haversine."""
    lat_cell, lon_cell = cell_sizes_deg(radius_km, max_abs_lat)
    hav = (
        "2.0 * 6371.0 * asin(sqrt("
        "pow(sin(radians(b.lat - a.lat) / 2), 2) + "
        "cos(radians(a.lat)) * cos(radians(b.lat)) * "
        "pow(sin(radians(b.lon - a.lon) / 2), 2)))"
    )
    return (
        f"WITH gpts AS (SELECT {id_col} AS id, CAST({lat_col} AS DOUBLE) AS lat, "
        f"  CAST({lon_col} AS DOUBLE) AS lon, "
        f"  CAST(floor({lat_col} / {lat_cell!r}) AS BIGINT) AS ci, "
        f"  CAST(floor({lon_col} / {lon_cell!r}) AS BIGINT) AS cj FROM {points_rel}), "
        "offs AS (SELECT di, dj FROM range(-1, 2) t1(di), range(-1, 2) t2(dj)) "
        f"SELECT a.id AS id_a, b.id AS id_b, {hav} AS dist_km "
        "FROM gpts a JOIN offs ON TRUE "
        "JOIN gpts b ON b.ci = a.ci + offs.di AND b.cj = a.cj + offs.dj "
        f"WHERE a.id < b.id AND {hav} <= {radius_km!r}"
    )
