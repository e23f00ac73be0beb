"""Regenerate SIMPLIFY_GOLDEN_VALUES for the `simplify` gate.

An INDEPENDENT scalar Douglas-Peucker — textbook recursion, clamped
point-to-segment distance, strict > tolerance, first-max tie break —
deliberately NOT the engine's iterative numpy kernel
(geobuf_cpp_spark/operators/simplify.py), so the gate's expected values
come from a second implementation of the same spec.

Prints the VALUES tuples (i1, i2, i3, n_kept, xsum, ysum) for every
amplitude-index combo of the planted 5-vertex zigzag, plus the minimum
decision margin (distance of any split decision from the tolerance);
keep that margin comfortably above float64 noise when changing AMPS.
"""

from __future__ import annotations

import itertools
import math

AMPS = [-6.0, -2.0, 0.25, 0.75, 3.5]
XS = [0.0, 2.0, 5.0, 7.0, 10.0]
TOL = 1.0


def seg_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    abx, aby = bx - ax, by - ay
    denom = abx * abx + aby * aby
    if denom == 0.0:
        dx, dy = px - ax, py - ay
        return math.sqrt(dx * dx + dy * dy)
    t = ((px - ax) * abx + (py - ay) * aby) / denom
    t = min(1.0, max(0.0, t))
    qx, qy = ax + t * abx, ay + t * aby
    dx, dy = px - qx, py - qy
    return math.sqrt(dx * dx + dy * dy)


def dp(points, tol, margins) -> list[int]:
    keep = {0, len(points) - 1}

    def rec(i: int, j: int) -> None:
        if j - i < 2:
            return
        best_d, best_k = -1.0, -1
        for k in range(i + 1, j):
            d = seg_dist(points[k], points[i], points[j])
            if d > best_d:  # strict: first max wins ties
                best_d, best_k = d, k
        margins.append(abs(best_d - tol))
        if best_d > tol:
            keep.add(best_k)
            rec(i, best_k)
            rec(best_k, j)

    rec(0, len(points) - 1)
    return sorted(keep)


def main() -> None:
    margins: list[float] = []
    rows = []
    for i1, i2, i3 in itertools.product(range(5), repeat=3):
        pts = [
            (XS[0], 0.0),
            (XS[1], AMPS[i1]),
            (XS[2], AMPS[i2]),
            (XS[3], AMPS[i3]),
            (XS[4], 0.0),
        ]
        kept = dp(pts, TOL, margins)
        rows.append(
            (i1, i2, i3, len(kept),
             sum(pts[k][0] for k in kept), sum(pts[k][1] for k in kept))
        )
    print(f"-- min decision margin: {min(margins):.6f}")
    for i in range(0, len(rows), 5):
        print(", ".join(f"({a},{b},{c},{n},{x},{y})"
                        for a, b, c, n, x, y in rows[i:i + 5]) + ",")


if __name__ == "__main__":
    main()
