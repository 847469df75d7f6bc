"""Geodesic distance as native Spark expressions (SURVEY.md §2.9 G5).

The reference computes zone-pair distances with DuckDB's
``ST_Distance_Sphere`` (silver/distances.py:32) — a spherical-earth model.
Spark has no spatial builtin, but haversine is a handful of trig calls that
whole-stage-codegen compiles JVM-side; no UDF, no Sedona dependency.

Scale note: as a pure expression this runs inside the join stage itself —
at 100 TB of pairs there is no extra shuffle, serialization, or Python
boundary; the distance is computed streaming over the joined rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mean earth radius in meters (IUGG); DuckDB's spatial extension uses the
# same spherical model for ST_Distance_Sphere.
EARTH_RADIUS_M = 6371008.8


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in kilometers between two lon/lat points.

    Mirrors ``ST_Distance_Sphere(p1, p2) / 1000.0``
    (reference silver/distances.py:32).
    """
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlon / 2) ** 2
    )
    c = 2 * F.asin(F.sqrt(a))
    return c * F.lit(EARTH_RADIUS_M / 1000.0)
