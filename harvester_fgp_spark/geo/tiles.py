"""Web-mercator (slippy-map) tile math — SURVEY.md §2.4 G7.

Point->tile is pure arithmetic, so the production plan keeps it **native**
(Spark SQL expressions, see operators.geo.with_tile) and stays inside
whole-stage codegen; the numpy versions here back the polygon rasterizer
and the unit/property tests.

Tile convention (OSM/slippy):
    n = 2^z
    tile_x = floor((lon + 180) / 360 * n)
    tile_y = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * n)
with lat clamped to the web-mercator domain [-85.05112878, 85.05112878]
and x/y clamped to [0, n-1].

Packed tile id (for checkpoint keys):  (z << 58) | (x << 29) | y
(29 bits each side supports z <= 28; z fits in 6 bits).
"""

from __future__ import annotations

import numpy as np

MERC_LAT_MAX = 85.05112878
DEFAULT_TILE_Z = 8


def point_to_tile(
    lon: np.ndarray, lat: np.ndarray, z: int = DEFAULT_TILE_Z
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized lon/lat -> (tile_x, tile_y) at zoom z."""
    n = np.int64(1) << np.int64(z)
    lat_c = np.clip(np.asarray(lat, dtype=np.float64), -MERC_LAT_MAX, MERC_LAT_MAX)
    lon_a = np.asarray(lon, dtype=np.float64)
    x = np.floor((lon_a + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat_c)
    y = np.floor(
        (1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def tile_bounds(x: int, y: int, z: int) -> tuple[float, float, float, float]:
    """(west, south, east, north) of one tile."""
    n = float(1 << z)
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0

    def _lat(yy: float) -> float:
        return float(np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yy / n)))))

    return west, _lat(y + 1), east, _lat(y)


def pack_tile(z: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(z, x, y) -> single int64 tile id (checkpoint/lineage key)."""
    return (
        (np.asarray(z, dtype=np.int64) << np.int64(58))
        | (np.asarray(x, dtype=np.int64) << np.int64(29))
        | np.asarray(y, dtype=np.int64)
    )


def unpack_tile(tid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    t = np.asarray(tid, dtype=np.int64)
    mask = np.int64((1 << 29) - 1)
    return (t >> np.int64(58)), (t >> np.int64(29)) & mask, t & mask


def _edge_supercover(rings: list, z: int) -> set:
    """Every (tile_x, tile_y) a ring edge passes through — EXACT for
    straight lon/lat segments. Column bands are linear in lon, so a
    segment's lat range within one column sits at the column's two
    boundary lons (linear interpolation); converting that lat range
    through the (monotone) mercator y gives the row span. Vertex tiles
    are the degenerate one-column case, so this is a strict superset of
    the old contains-a-vertex rule."""
    n = 1 << z
    nf = float(n)
    tiles: set = set()
    for rx, ry in rings:
        rx = np.asarray(rx, dtype=np.float64)
        ry = np.asarray(ry, dtype=np.float64)
        if rx[0] != rx[-1] or ry[0] != ry[-1]:  # ensure closure
            rx = np.append(rx, rx[0])
            ry = np.append(ry, ry[0])
        for i in range(len(rx) - 1):
            lon0, lat0, lon1, lat1 = rx[i], ry[i], rx[i + 1], ry[i + 1]
            if lon1 < lon0:
                lon0, lat0, lon1, lat1 = lon1, lat1, lon0, lat0
            x0 = int(point_to_tile(np.array([lon0]), np.array([lat0]), z)[0][0])
            x1 = int(point_to_tile(np.array([lon1]), np.array([lat1]), z)[0][0])
            for c in range(x0, x1 + 1):
                if lon1 == lon0:
                    la_lat, lb_lat = lat0, lat1
                else:
                    la = lon0 if c == x0 else (c / nf * 360.0 - 180.0)
                    lb = lon1 if c == x1 else ((c + 1) / nf * 360.0 - 180.0)
                    ta = (la - lon0) / (lon1 - lon0)
                    tb = (lb - lon0) / (lon1 - lon0)
                    la_lat = lat0 + ta * (lat1 - lat0)
                    lb_lat = lat0 + tb * (lat1 - lat0)
                ys = point_to_tile(
                    np.array([0.0, 0.0]), np.array([la_lat, lb_lat]), z
                )[1]
                for ty in range(int(ys.min()), int(ys.max()) + 1):
                    tiles.add((c, ty))
    return tiles


def rasterize_rings_to_tiles(
    rings: list, z: int = DEFAULT_TILE_Z
) -> np.ndarray:
    """Multi-ring polygon -> set of packed tile ids it intersects (G7
    raster<->vector; even-odd across rings since round 3, matching the
    PIP index's semantics).

    EXACT cover (round-3 review fix): a tile overlaps the polygon iff
    (a) a polygon edge crosses it -> it is in the per-edge supercover,
    (b) the tile is entirely inside -> its center is inside under the
    even-odd rule (XOR of per-ring ray casts — holes punch out interior
    tiles), or (c) the polygon is entirely inside the tile -> its
    vertices are, and vertex tiles are in the supercover. The old
    contains-a-vertex rule missed tiles a thin sliver crossed without
    leaving a vertex; the supercover cannot. Fully vectorized center
    test over the all-rings bbox grid; the supercover loop is per edge
    x per crossed column (collection polygons: <= 64 verts, <= 5° radii
    — a few dozen iterations per polygon).
    """
    from .pip import points_in_ring

    w = min(float(np.min(rx)) for rx, _ in rings)
    e = max(float(np.max(rx)) for rx, _ in rings)
    s = min(float(np.min(ry)) for _, ry in rings)
    n = max(float(np.max(ry)) for _, ry in rings)
    x0, y0 = point_to_tile(np.array([w]), np.array([n]), z)  # NW corner
    x1, y1 = point_to_tile(np.array([e]), np.array([s]), z)  # SE corner
    xs = np.arange(int(x0[0]), int(x1[0]) + 1, dtype=np.int64)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    nf = float(1 << z)
    cx = (gx + 0.5) / nf * 360.0 - 180.0
    cy = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (gy + 0.5) / nf))))
    inside = np.zeros(len(gx), dtype=bool)
    for ring_x, ring_y in rings:
        inside ^= points_in_ring(cx, cy, ring_x, ring_y)
    grid_ids = pack_tile(
        np.full(int(inside.sum()), z, dtype=np.int64), gx[inside], gy[inside]
    )
    sc = _edge_supercover(rings, z)
    if sc:
        scx = np.array([c for c, _ in sc], dtype=np.int64)
        scy = np.array([t for _, t in sc], dtype=np.int64)
        sc_ids = pack_tile(np.full(len(sc), z, dtype=np.int64), scx, scy)
        return np.unique(np.concatenate([grid_ids, sc_ids]))
    return np.unique(grid_ids)


def rasterize_ring_to_tiles(
    ring_x: np.ndarray, ring_y: np.ndarray, z: int = DEFAULT_TILE_Z
) -> np.ndarray:
    """Single-ring wrapper (round-2 surface) over the multi-ring kernel."""
    return rasterize_rings_to_tiles([(ring_x, ring_y)], z)
