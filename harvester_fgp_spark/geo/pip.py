"""Vectorized point-in-polygon + packed STR R-tree (SURVEY.md §2.4 G4, §7.4-2).

shapely is absent in this sandbox, so the exact PIP test is an even-odd
ray-casting implemented as whole-array numpy over ring vertex arrays, and
the "broadcast R-tree" (BASELINE.json:6) is a packed, Sort-Tile-Recursive
bulk-loaded tree stored as plain numpy arrays — pickles cheaply into a
Spark broadcast, rebuilds nothing on the executor, and queries with
vectorized bbox overlap tests.

Scale design: the polygon dimension is small (FGP collections ~10^2..10^4),
so the tree rides a broadcast variable; each Python worker deserializes it
ONCE per executor (iterator pandas UDF, SURVEY §2.11) and then answers
millions of point queries with numpy batch ops.

GEOMETRY CONTRACT (round 5 — applies to every PIP path and both
rasterizers): ring edges are treated as STRAIGHT LINES IN LON/LAT
(equirectangular plane), not geodesics — the standard convention for
web-mercator tiling and for GeoJSON-style rings. Divergence from the
great-circle edge is the chord-vs-geodesic sagitta, ~ (L^2 / 8R) *
|tan(lat)| cross-track for an east-west edge of ground length L at
latitude lat: ~0.2 km for a 100 km edge at 45 deg, ~5 km * tan(lat)
for a 500 km edge (the largest a 5-deg-radius collection polygon
produces), and identically ZERO for north-south edges (meridians are
geodesics). Points within that band of a long high-latitude edge may
classify differently than a geodesic-edged test would — acceptable for
metadata-collection membership (the reference's own bbox/GeoJSON
semantics are planar too); densify long edges at index build if a
future use case needs geodesic edges, the even-odd rule is unchanged
by densification.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(
    px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray
) -> np.ndarray:
    """Even-odd ray cast: which of (px, py) fall inside the closed ring.

    Vectorized over points x edges ((N_pts, N_edges) boolean work, chunked
    by the caller via batching). Uses the half-open edge rule
    ``(y1 > py) != (y2 > py)`` which handles horizontal edges and counts
    each vertex crossing exactly once (standard Franklin PNPOLY semantics).
    Points exactly on an edge may land either side — acceptable for join
    semantics and covered by the hypothesis tests vs brute force.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1 = np.asarray(ring_x, dtype=np.float64)[None, :-1]
    y1 = np.asarray(ring_y, dtype=np.float64)[None, :-1]
    x2 = np.asarray(ring_x, dtype=np.float64)[None, 1:]
    y2 = np.asarray(ring_y, dtype=np.float64)[None, 1:]
    straddles = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at_y = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = straddles & (px < x_at_y)
    return (crossings.sum(axis=1) % 2).astype(bool)


class PackedRTree:
    """STR-packed static R-tree over polygon bboxes, as flat numpy arrays.

    Two levels (leaves of `leaf_size` entries + one root directory) — for
    10^4 polygons that is ~640 leaf bboxes, and the query path is two
    vectorized overlap scans; no per-node Python recursion.
    """

    def __init__(
        self,
        minx: np.ndarray,
        miny: np.ndarray,
        maxx: np.ndarray,
        maxy: np.ndarray,
        leaf_size: int = 16,
    ) -> None:
        n = len(minx)
        order = np.lexsort((miny, minx))  # STR: sort by x then y
        self.order = order.astype(np.int64)
        self.minx = np.asarray(minx, dtype=np.float64)[order]
        self.miny = np.asarray(miny, dtype=np.float64)[order]
        self.maxx = np.asarray(maxx, dtype=np.float64)[order]
        self.maxy = np.asarray(maxy, dtype=np.float64)[order]
        self.leaf_size = leaf_size
        n_leaves = max(1, (n + leaf_size - 1) // leaf_size)
        pad = n_leaves * leaf_size - n
        if pad:
            self.minx = np.concatenate([self.minx, np.full(pad, np.inf)])
            self.miny = np.concatenate([self.miny, np.full(pad, np.inf)])
            self.maxx = np.concatenate([self.maxx, np.full(pad, -np.inf)])
            self.maxy = np.concatenate([self.maxy, np.full(pad, -np.inf)])
        shape = (n_leaves, leaf_size)
        self.leaf_minx = self.minx.reshape(shape).min(axis=1)
        self.leaf_miny = self.miny.reshape(shape).min(axis=1)
        self.leaf_maxx = self.maxx.reshape(shape).max(axis=1)
        self.leaf_maxy = self.maxy.reshape(shape).max(axis=1)
        self.n = n

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (point_idx, polygon_idx-in-original-order) bbox candidates.

        Vectorized: points x leaves overlap matrix, then points x entries
        within only the touched leaves.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        hit_leaf = (
            (px[:, None] >= self.leaf_minx[None, :])
            & (px[:, None] <= self.leaf_maxx[None, :])
            & (py[:, None] >= self.leaf_miny[None, :])
            & (py[:, None] <= self.leaf_maxy[None, :])
        )
        pt_idx, leaf_idx = np.nonzero(hit_leaf)
        if len(pt_idx) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        ls = self.leaf_size
        entry = (leaf_idx[:, None] * ls + np.arange(ls)[None, :]).ravel()
        pts = np.repeat(pt_idx, ls)
        valid = entry < self.n
        entry, pts = entry[valid], pts[valid]
        inside = (
            (px[pts] >= self.minx[entry])
            & (px[pts] <= self.maxx[entry])
            & (py[pts] >= self.miny[entry])
            & (py[pts] <= self.maxy[entry])
        )
        return pts[inside], self.order[entry[inside]]


class PolygonIndex:
    """Broadcast payload for G4: PackedRTree + ragged ring arrays.

    ``match_points`` = candidate generation (R-tree) + exact ray-cast PIP,
    all numpy. Returns (point_idx, polygon_idx) matched pairs.

    Each polygon is a LIST of rings interpreted with even-odd semantics
    (round 3): containment = XOR of the per-ring ray casts. That covers
    holes (outer XOR hole = annulus) AND disjoint multipolygon parts
    (inside exactly one part => odd) with a single rule — the natural
    even-odd extension of the Franklin crossing test, no ring
    orientation/winding bookkeeping needed. A bare ``(rx, ry)`` tuple is
    accepted as the 1-ring case (round-2 call sites unchanged).
    """

    def __init__(
        self,
        polygon_ids: list[str],
        rings: list,  # per polygon: (rx, ry) | [(rx, ry), ...]
    ) -> None:
        self.polygon_ids = list(polygon_ids)
        self.rings: list[list[tuple[np.ndarray, np.ndarray]]] = []
        for poly in rings:
            if isinstance(poly, tuple):
                poly = [poly]
            self.rings.append(
                [
                    (
                        np.asarray(rx, dtype=np.float64),
                        np.asarray(ry, dtype=np.float64),
                    )
                    for rx, ry in poly
                ]
            )
        # candidate bbox spans ALL rings (multipolygon parts extend it;
        # holes are interior so they never do, but min/max is harmless)
        minx = np.array([min(rx.min() for rx, _ in p) for p in self.rings])
        maxx = np.array([max(rx.max() for rx, _ in p) for p in self.rings])
        miny = np.array([min(ry.min() for _, ry in p) for p in self.rings])
        maxy = np.array([max(ry.max() for _, ry in p) for p in self.rings])
        self.tree = PackedRTree(minx, miny, maxx, maxy)

    def match_points(
        self, lon: np.ndarray, lat: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        pts, polys = self.tree.query_points(lon, lat)
        if len(pts) == 0:
            return pts, polys
        keep = np.zeros(len(pts), dtype=bool)
        # Group candidate pairs by polygon: one vectorized ray cast per
        # (polygon, ring) over all its candidate points (polygon count is
        # small); even-odd across rings via XOR.
        order = np.argsort(polys, kind="stable")
        pts_s, polys_s = pts[order], polys[order]
        bounds = np.searchsorted(polys_s, np.arange(len(self.rings) + 1))
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        for poly in np.unique(polys_s):
            lo, hi = bounds[poly], bounds[poly + 1]
            px, py = lon[pts_s[lo:hi]], lat[pts_s[lo:hi]]
            inside = np.zeros(hi - lo, dtype=bool)
            for rx, ry in self.rings[poly]:
                inside ^= points_in_ring(px, py, rx, ry)
            keep[order[lo:hi]] = inside
        return pts[keep], polys[keep]
