"""WKT parse + centroid (SURVEY.md §2.9 G1-G4) and haversine (G5)."""

from __future__ import annotations

import math

import pytest

from bigdata_project_spark.functions.geo import (
    haversine_km,
    multipolygon_centroid,
    parse_wkt_polygons,
    wkt_centroids,
)


def test_parse_polygon_promotes_to_multi():
    polys = parse_wkt_polygons("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert len(polys) == 1 and len(polys[0]) == 1
    assert polys[0][0][1] == (4.0, 0.0)


def test_parse_multipolygon_with_hole():
    wkt = "MULTIPOLYGON(((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2)), ((10 0, 12 0, 12 2, 10 2, 10 0)))"
    polys = parse_wkt_polygons(wkt)
    assert [len(rings) for rings in polys] == [2, 1]


def test_centroid_square():
    polys = parse_wkt_polygons("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert multipolygon_centroid(polys) == pytest.approx((2.0, 2.0))


def test_centroid_with_hole_shifts_away():
    # square [0,6]² minus square hole [3,5]×[1,3]: centroid moves up-left.
    # Hole ring wound clockwise → negative signed area.
    wkt = "POLYGON((0 0, 6 0, 6 6, 0 6, 0 0), (3 1, 3 3, 5 3, 5 1, 3 1))"
    cx, cy = multipolygon_centroid(parse_wkt_polygons(wkt))
    # closed form: (36*3 - 4*4)/32, (36*3 - 4*2)/32
    assert (cx, cy) == pytest.approx((92 / 32, 100 / 32))


def test_centroid_area_weighted_not_vertex_mean():
    # two triangles, areas 3 and 6 → weights 1:2
    wkt = "MULTIPOLYGON(((0 0, 2 0, 0 3, 0 0)), ((10 10, 16 10, 10 12, 10 10)))"
    cx, cy = multipolygon_centroid(parse_wkt_polygons(wkt))
    assert (cx, cy) == pytest.approx((74 / 9, 67 / 9))


def test_wkt_centroids_mapinpandas(spark):
    df = spark.createDataFrame(
        [(1, "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")], "id int, wkt string"
    )
    row = wkt_centroids(df).first()
    assert (row["centroid_lon"], row["centroid_lat"]) == pytest.approx((1.0, 1.0))


def test_haversine_known_distance(spark):
    # Madrid (-3.7038, 40.4168) ↔ Barcelona (2.1734, 41.3851) ≈ 505 km
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        haversine_km(
            F.lit(-3.7038), F.lit(40.4168), F.lit(2.1734), F.lit(41.3851)
        ).alias("km")
    )
    km = df.first()["km"]
    assert km == pytest.approx(505, rel=0.01)
    # zero distance, antisymmetry
    assert math.isclose(
        spark.range(1)
        .select(haversine_km(F.lit(1.0), F.lit(2.0), F.lit(1.0), F.lit(2.0)).alias("km"))
        .first()["km"],
        0.0,
        abs_tol=1e-9,
    )


def test_point_in_zone_matches_python_reference(spark, sf_dir):
    """Every (point, zone) match agrees with a driver-side barycentric check."""
    from bigdata_project_spark.operators.spatial_join import query_point_in_zone

    out = query_point_in_zone(spark, sf_dir).collect()
    assert out

    def inside(px, py, k):
        return (
            2.0 * py >= 0
            and -py - 3.0 * (px - k - 2.0) >= 0
            and 3.0 * (px - k) - py >= 0
        )

    for r in out:
        assert inside(r["px"], r["py"], float(r["zone_key"])), r
        assert r["zone_key"] <= r["px"] <= r["zone_key"] + 2  # bbox sanity
