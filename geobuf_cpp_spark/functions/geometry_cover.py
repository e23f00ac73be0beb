"""Rectangle-vs-polygon intersection kernel for exact cell covering.

Vectorized over a batch of axis-aligned rectangles (the candidate cells)
against one polygon's rings. A rectangle intersects the polygon iff:
  (a) its center lies inside (even-odd over all rings), or
  (b) any polygon vertex lies inside the rectangle, or
  (c) any polygon edge crosses any rectangle edge.
This is conservative-exact for the PIP prefilter: never drops a cell the
polygon touches, and the downstream ray-crossing refine removes any cell
kept spuriously is irrelevant (refine is per point, not per cell).
"""

from __future__ import annotations

import numpy as np

from .geometry import pip_mask


def _segments_cross(ax, ay, bx, by, cx, cy, dx, dy):
    """Vectorized proper/improper segment intersection (orientation test).

    a,b are (n,) rectangle-edge endpoints; c,d scalars per polygon edge.
    """
    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = orient(cx, cy, dx, dy, ax, ay)
    d2 = orient(cx, cy, dx, dy, bx, by)
    d3 = orient(ax, ay, bx, by, cx, cy)
    d4 = orient(ax, ay, bx, by, dx, dy)
    return ((d1 * d2) <= 0) & ((d3 * d4) <= 0)


def rect_intersects_rings(lon0, lat0, lon1, lat1, rings) -> np.ndarray:
    """(n,) bool: does rect i intersect the polygon (rings incl. holes)?"""
    n = lon0.shape[0]
    cx = (lon0 + lon1) / 2.0
    cy = (lat0 + lat1) / 2.0
    keep = pip_mask(cx, cy, rings)  # (a) center inside

    # (b) any polygon vertex inside the rectangle
    for ring in rings:
        for vx, vy in ring[:-1]:
            keep |= (lon0 <= vx) & (vx < lon1) & (lat0 <= vy) & (vy < lat1)

    # (c) any polygon edge crosses any rectangle edge
    rect_edges = (
        (lon0, lat0, lon1, lat0),
        (lon1, lat0, lon1, lat1),
        (lon1, lat1, lon0, lat1),
        (lon0, lat1, lon0, lat0),
    )
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        for j in range(x1.shape[0]):
            if keep.all():
                return keep
            for ax, ay, bx, by in rect_edges:
                keep |= _segments_cross(
                    ax, ay, bx, by,
                    float(x1[j]), float(y1[j]), float(x2[j]), float(y2[j]),
                )
    return keep
