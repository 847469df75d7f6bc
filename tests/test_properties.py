"""Property-based checks (hypothesis) for the portability invariants the
oracle strategy rests on: portable rounding, universal-hash arithmetic, and
the WKT centroid — all must behave identically in Python, DuckDB, and (by
construction of identical expressions) Spark."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_project_spark.functions.geo import (
    multipolygon_centroid,
    parse_wkt_polygons,
)
from bigdata_project_spark.functions.scalars import round_portable_sql
from bigdata_project_spark.operators.text_dedup import _MH_A, _MH_B, _MH_P


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_round_portable_matches_python(x):
    """floor(x·10⁶ + 0.5)/10⁶ in DuckDB == the same IEEE ops in Python."""
    con = duckdb.connect()
    # CAST: bare literals parse as DECIMAL in DuckDB; the real oracles
    # always feed DOUBLE columns/expressions into round_portable_sql
    got = con.execute(
        f"SELECT {round_portable_sql(f'CAST({x!r} AS DOUBLE)', 6)}"
    ).fetchone()[0]
    want = math.floor(x * 1e6 + 0.5) / 1e6
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1), st.integers(min_value=0, max_value=11))
def test_minhash_universal_hash_exact_in_bigint(v, i):
    """(v·a + b) mod P stays exact in BIGINT on both sides for any 32-bit v."""
    con = duckdb.connect()
    a, b = _MH_A[i], _MH_B[i]
    assert v * a + b < 2**63  # no overflow on either engine
    got = con.execute(f"SELECT (CAST({v} AS BIGINT) * {a} + {b}) % {_MH_P}").fetchone()[0]
    assert got == (v * a + b) % _MH_P


_coord = st.integers(min_value=-1000, max_value=1000)


_edge = st.integers(min_value=1, max_value=60)


@st.composite
def _triangle(draw):
    """Right triangle anchored at a random point, legs along the axes, a
    shear on the apex — always CCW and non-degenerate, no rejection loop."""
    x0, y0 = draw(_coord), draw(_coord)
    w, h, shear = draw(_edge), draw(_edge), draw(_coord)
    return [(x0, y0), (x0 + w, y0), (x0 + shear, y0 + h)]


def _wkt_of(tris):
    rings = ", ".join(
        "((" + ", ".join(f"{x} {y}" for x, y in t + [t[0]]) + "))" for t in tris
    )
    return f"MULTIPOLYGON({rings})"


@settings(max_examples=100, deadline=None)
@given(st.lists(_triangle(), min_size=1, max_size=4), _coord, _coord)
def test_centroid_translation_equivariant(tris, dx, dy):
    """centroid(T + (dx,dy)) == centroid(T) + (dx,dy) — catches any
    asymmetry in parsing or the shoelace accumulation."""
    cx, cy = multipolygon_centroid(parse_wkt_polygons(_wkt_of(tris)))
    moved = [[(x + dx, y + dy) for x, y in t] for t in tris]
    mx, my = multipolygon_centroid(parse_wkt_polygons(_wkt_of(moved)))
    assert mx == pytest.approx(cx + dx, abs=1e-6)
    assert my == pytest.approx(cy + dy, abs=1e-6)


@settings(max_examples=100, deadline=None)
@given(_triangle())
def test_centroid_triangle_is_vertex_mean(t):
    cx, cy = multipolygon_centroid(parse_wkt_polygons(_wkt_of([t])))
    assert cx == pytest.approx(sum(x for x, _ in t) / 3, abs=1e-9)
    assert cy == pytest.approx(sum(y for _, y in t) / 3, abs=1e-9)
