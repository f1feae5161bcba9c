"""Property tests for the pure-numpy geo kernel (SURVEY.md §5.2-3).

Spark-free — run in milliseconds, so hypothesis can afford many examples.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from harvester_fgp_spark.geo import cells, distance, pip, tiles

lat_st = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_st = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)


@given(lon_st, lat_st, st.integers(min_value=1, max_value=cells.MAX_LEVEL))
@settings(max_examples=200)
def test_encode_decode_roundtrip(lon, lat, level):
    cell = cells.encode(np.array([lon]), np.array([lat]), level)
    x, y = cells.decode_xy(cell)
    ex, ey = cells.lonlat_to_xy(np.array([lon]), np.array([lat]), level)
    assert x[0] == ex[0] and y[0] == ey[0]
    # lon is half-open [w, e); lat is half-open (s, n] (y counts from north)
    w, s, e, n = cells.cell_bounds(cell, level)
    eps = 1e-9
    assert w[0] - eps <= lon <= e[0] + eps
    assert s[0] - eps <= lat <= n[0] + eps


@given(lon_st, lat_st, st.integers(min_value=2, max_value=20),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=200)
def test_parent_prefix_containment(lon, lat, level, up):
    """parent(encode(p, k), j) == encode(p, j) — the J3 join-key property."""
    parent_level = max(0, level - up)
    fine = cells.encode(np.array([lon]), np.array([lat]), level)
    coarse = cells.encode(np.array([lon]), np.array([lat]), parent_level)
    assert cells.parent(fine, level, parent_level)[0] == coarse[0]


def test_encode_injective_within_level():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    c = cells.encode(lon, lat, 16)
    x, y = cells.lonlat_to_xy(lon, lat, 16)
    # distinct grid squares <=> distinct ids
    grid = set(zip(x.tolist(), y.tolist()))
    assert len(set(c.tolist())) == len(grid)


def test_cover_bbox_contains_inner_points():
    rng = np.random.default_rng(3)
    for _ in range(50):
        w, s = rng.uniform(-170, 160), rng.uniform(-80, 70)
        e, n = w + rng.uniform(0.01, 10), s + rng.uniform(0.01, 10)
        cover = set(cells.cover_bbox(w, s, e, n, cells.COVER_LEVEL).tolist())
        lon = rng.uniform(w, e, 100)
        lat = rng.uniform(s, n, 100)
        pt = cells.encode(lon, lat, cells.COVER_LEVEL)
        assert set(pt.tolist()) <= cover


def test_morton_sql_matches_numpy():
    import duckdb

    rng = np.random.default_rng(11)
    x = rng.integers(0, 1 << 12, 1000)
    y = rng.integers(0, 1 << 12, 1000)
    import pandas as pd

    expected = cells.interleave_xy(x, y)
    sql = cells.morton_interleave_sql("x", "y", 12)
    df = pd.DataFrame({"x": x, "y": y})  # noqa: F841 (used by duckdb scan)
    got = duckdb.sql(f"select {sql} as c from df").df()["c"].to_numpy()
    np.testing.assert_array_equal(got, expected)


@given(lon_st, lat_st, st.integers(min_value=0, max_value=18))
@settings(max_examples=200)
def test_tile_formula_matches_reference_formula(lon, lat, z):
    """G7 point->tile equals the canonical OSM slippy formula."""
    import math

    x, y = tiles.point_to_tile(np.array([lon]), np.array([lat]), z)
    n = 2**z
    ex = min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))
    lat_c = min(tiles.MERC_LAT_MAX, max(-tiles.MERC_LAT_MAX, lat))
    ey = min(
        n - 1,
        max(0, int((1.0 - math.asinh(math.tan(math.radians(lat_c))) / math.pi) / 2.0 * n)),
    )
    assert (x[0], y[0]) == (ex, ey)


@given(st.integers(0, 28), st.integers(0, 2**28 - 1), st.integers(0, 2**28 - 1))
def test_tile_pack_roundtrip(z, x, y):
    t = tiles.pack_tile(np.array([z]), np.array([x]), np.array([y]))
    zz, xx, yy = tiles.unpack_tile(t)
    assert (zz[0], xx[0], yy[0]) == (z, x, y)


def _brute_pip(px, py, rx, ry):
    """Scalar reference ray cast (independent implementation)."""
    inside = False
    for i in range(len(rx) - 1):
        x1, y1, x2, y2 = rx[i], ry[i], rx[i + 1], ry[i + 1]
        if (y1 > py) != (y2 > py):
            xa = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xa:
                inside = not inside
    return inside


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=100)
def test_pip_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 12))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    r = rng.uniform(0.5, 5.0, k)
    cx, cy = rng.uniform(-100, 100), rng.uniform(-60, 60)
    rx = np.append(cx + r * np.cos(ang), cx + r[0] * np.cos(ang[0]))
    ry = np.append(cy + r * np.sin(ang), cy + r[0] * np.sin(ang[0]))
    px = rng.uniform(cx - 6, cx + 6, 200)
    py = rng.uniform(cy - 6, cy + 6, 200)
    got = pip.points_in_ring(px, py, rx, ry)
    exp = np.array([_brute_pip(a, b, rx, ry) for a, b in zip(px, py)])
    np.testing.assert_array_equal(got, exp)


def test_rtree_candidates_superset_of_exact():
    rng = np.random.default_rng(5)
    n = 300
    minx = rng.uniform(-150, 140, n)
    miny = rng.uniform(-80, 70, n)
    maxx = minx + rng.uniform(0.1, 8, n)
    maxy = miny + rng.uniform(0.1, 8, n)
    tree = pip.PackedRTree(minx, miny, maxx, maxy)
    px = rng.uniform(-160, 160, 500)
    py = rng.uniform(-85, 85, 500)
    pts, polys = tree.query_points(px, py)
    got = set(zip(pts.tolist(), polys.tolist()))
    exp = set()
    for i in range(500):
        hit = np.nonzero(
            (px[i] >= minx) & (px[i] <= maxx) & (py[i] >= miny) & (py[i] <= maxy)
        )[0]
        exp |= {(i, int(j)) for j in hit}
    assert got == exp


def test_polygon_index_end_to_end():
    from harvester_fgp_spark.synth import generate_polygons

    pdf = generate_polygons(50, seed=42)
    rings = [
        (np.array([p["x"] for p in r]), np.array([p["y"] for p in r]))
        for r in pdf["ring"]
    ]
    idx = pip.PolygonIndex(pdf["polygon_id"].tolist(), rings)
    rng = np.random.default_rng(9)
    lon = rng.uniform(-141, -52, 2000)
    lat = rng.uniform(42, 70, 2000)
    pts, polys = idx.match_points(lon, lat)
    # exact check against brute force over every polygon
    exp = set()
    for j, (rx, ry) in enumerate(rings):
        inside = pip.points_in_ring(lon, lat, rx, ry)
        exp |= {(int(i), j) for i in np.nonzero(inside)[0]}
    assert set(zip(pts.tolist(), polys.tolist())) == exp
    assert len(pts) > 0  # fixture produces matches


def test_haversine_known_value():
    # Ottawa -> Toronto ~ 352 km
    d = distance.haversine_km(
        np.array([45.4215]), np.array([-75.6972]),
        np.array([43.6532]), np.array([-79.3832]),
    )
    assert 340 < d[0] < 365
