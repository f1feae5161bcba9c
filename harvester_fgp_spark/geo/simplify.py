"""Douglas-Peucker polyline/ring simplification — pure numpy, Spark-free.

Iterative (explicit stack) rather than recursive so a pathological ring
cannot blow the Python recursion limit inside an executor; the per-split
distance scan is vectorized over the span (the only loop is over accepted
split points, which is output-sized).

Planar coordinates, consistent with the repo's planar-edge geometry
contract (geo/pip.py): at web-extraction magnitudes the lon/lat chord vs
great-circle deviation is far below any tolerance a tile pipeline would
pass here.
"""

from __future__ import annotations

import numpy as np


def simplify_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for one polyline (endpoints always kept).

    For a CLOSED ring pass the ring with its closing vertex (first ==
    last); both copies of the anchor survive and the interior is
    simplified against the chord structure, matching the classic
    formulation. Ties in the farthest-point argmax resolve to the first
    index (numpy argmax), which makes the output deterministic.
    """
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        x0, y0, x1, y1 = xs[i], ys[i], xs[j], ys[j]
        dx, dy = x1 - x0, y1 - y0
        px = xs[i + 1 : j]
        py = ys[i + 1 : j]
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d = np.hypot(px - x0, py - y0)
        else:
            d = np.abs(dy * (px - x0) - dx * (py - y0)) / np.sqrt(seg2)
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_ring(
    xs: np.ndarray, ys: np.ndarray, tol: float
) -> "tuple[np.ndarray, np.ndarray]":
    """Simplified copies of (xs, ys) (rows where the mask keeps them)."""
    m = simplify_mask(np.asarray(xs, float), np.asarray(ys, float), tol)
    return np.asarray(xs, float)[m], np.asarray(ys, float)[m]


def simplify_polygons_pdf(ppdf, tol: float):
    """Driver-side simplification of the polygons dim table (pandas form,
    FIXTURES.md §2) before the broadcast PolygonIndex build — fewer
    vertices shrink the broadcast payload and the per-point ray-cast
    work; bboxes are untouched (simplification never widens coverage
    pruning).

    Rings arrive CLOSED (first == last); the kernel always keeps both
    endpoints, so closure is preserved. A ring whose simplified form
    drops below 4 points (3 distinct + closing) is kept unsimplified —
    a degenerate 2-point "ring" would silently empty its polygon.
    Handles both the single ``ring`` column and the multi-ring
    ``rings`` column (holes / multipolygon parts).
    """

    def _one(ring):
        if ring is None:
            return ring
        xs = np.array([p["x"] for p in ring], dtype=float)
        ys = np.array([p["y"] for p in ring], dtype=float)
        m = simplify_mask(xs, ys, tol)
        if int(m.sum()) < 4:
            return ring
        return [p for p, k in zip(ring, m) if k]

    out = ppdf.copy()
    out["ring"] = [_one(r) for r in out["ring"]]
    if "rings" in out.columns:
        out["rings"] = [
            [_one(r) for r in rings] if rings is not None else rings
            for rings in out["rings"]
        ]
    return out
