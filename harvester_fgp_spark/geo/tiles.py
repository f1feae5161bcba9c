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


def rasterize_rings_to_tiles(
    rings: list, z: int = DEFAULT_TILE_Z
) -> np.ndarray:
    """Multi-ring polygon -> set of packed tile ids it intersects (G7
    raster<->vector; even-odd across rings since round 3, matching the
    PIP index's semantics).

    Conservative scanline over the tile grid of the all-rings bbox: a
    tile is emitted if its center is inside under the even-odd rule
    (XOR of per-ring ray casts — holes punch out interior tiles) OR it
    contains any ring vertex (every boundary tile, including hole
    boundaries, genuinely touches the polygon). For the bounded
    collection-polygon sizes this engine joins against (FIXTURES.md §2:
    radii <= 5°), bbox-grid enumeration is exact enough for candidate
    generation and is fully vectorized per polygon.
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
    vset: set = set()
    for ring_x, ring_y in rings:
        inside ^= points_in_ring(cx, cy, ring_x, ring_y)
        vx, vy = point_to_tile(ring_x, ring_y, z)
        vset.update(zip(vx.tolist(), vy.tolist()))
    on_edge = np.fromiter(
        (pair in vset for pair in zip(gx.tolist(), gy.tolist())),
        dtype=bool,
        count=len(gx),
    )
    keep = inside | on_edge
    tids = pack_tile(np.full(keep.sum(), z, dtype=np.int64), gx[keep], gy[keep])
    tids.sort()
    return tids


def rasterize_ring_to_tiles(
    ring_x: np.ndarray, ring_y: np.ndarray, z: int = DEFAULT_TILE_Z
) -> np.ndarray:
    """Single-ring wrapper (round-2 surface) over the multi-ring kernel."""
    return rasterize_rings_to_tiles([(ring_x, ring_y)], z)
