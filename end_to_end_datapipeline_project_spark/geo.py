"""Geo column functions.

Haversine as a *Column-composition* function — NOT a UDF.  The whole
expression stays inside Catalyst / whole-stage codegen, so it vectorizes on
the JVM and costs nothing to ship to 1000 executors.  (Reference formula:
gtfsGold.py:23-34; its orphan scratch file haversine_distance.py has a
different, incorrect formula and is deliberately excluded — SURVEY.md §2.9.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0

#: Warsaw bounding box used by the reference cleanse step
#: (gtfstransformerSilver.py:42, Readme.md:147).
WARSAW_BOX = {"lat_min": 52.0, "lat_max": 52.4, "lon_min": 20.5, "lon_max": 21.5}


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lon) points.

    a = sin²(Δφ/2) + cos φ₁ · cos φ₂ · sin²(Δλ/2)
    d = 2R · atan2(√a, √(1−a))

    Returns NULL if any input is NULL (first row of a lag window).
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    # greatest(0, 1-a): near-antipodal points can push a to
    # 1.0000000000000004 in IEEE double (verified reachable), and an
    # unclamped sqrt(1-a) is NaN on Spark but a HARD ERROR in DuckDB —
    # the clamp is applied identically in haversine_sql so the engines
    # stay bit-for-bit equal on in-range inputs too (greatest(0, x)
    # returns x unchanged for x > 0)
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(F.greatest(F.lit(0.0), 1 - a)))
    return F.lit(EARTH_RADIUS_KM) * c


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as ANSI SQL text (for oracle parity checks) —
    every constant and clamp mirrors haversine_km exactly."""
    dlat = f"radians({lat2} - {lat1})"
    dlon = f"radians({lon2} - {lon1})"
    a = (
        f"(pow(sin({dlat}/2), 2) + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin({dlon}/2), 2))"
    )
    return (
        f"({EARTH_RADIUS_KM} * 2 * atan2(sqrt({a}), "
        f"sqrt(greatest(0.0, 1 - {a}))))"
    )


def in_bounding_box(
    lat: Column,
    lon: Column,
    lat_min: float = WARSAW_BOX["lat_min"],
    lat_max: float = WARSAW_BOX["lat_max"],
    lon_min: float = WARSAW_BOX["lon_min"],
    lon_max: float = WARSAW_BOX["lon_max"],
) -> Column:
    """Range predicate for a geo bounding box (reference P4).

    A plain BETWEEN conjunction — Catalyst pushes it into the parquet scan
    (row-group stats pruning), which is exactly what you want at 100 TB.
    """
    return lat.between(lat_min, lat_max) & lon.between(lon_min, lon_max)
