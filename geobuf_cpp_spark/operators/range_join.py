"""Distance (range) join — all pairs within a radius, grid-blocked.

The classic spatial workload the reference's cell machinery exists to
serve (geobuf-cpp indexes geometries but leaves joins to the caller;
cf. README.md:17 "query and data-processing" framing): given point sets
L and R, emit every (l, r) with dist(l, r) <= radius. The naive plan is
a cross join — O(|L|·|R|) and unshippable at 10^12 rows. The scale plan
is grid blocking:

  1. bucket both sides into square cells of side = radius,
  2. expand ONE side to its 3x3 cell neighborhood (a 9x row fan-out of
     (id, x, y) triples — ~24 bytes/row, cheap),
  3. equi-join on the cell key (one shuffle per side, AQE-splittable),
  4. exact distance filter on the survivors.

Every qualifying pair is found exactly once (the build side sits in one
cell; the probe side visits that cell once), so no distinct is needed.
The candidate ratio is bounded: a cell of side r can only pair with
points within sqrt(8)·r, so candidates per true pair are O(1) for
non-adversarial distributions; city-skewed hot cells are handled by the
same AQE skew-join split the PIP join relies on.

Coordinates are INTEGER planar (the orders lattice is centidegrees), so
the distance test is exact BIGINT arithmetic — zero cross-engine float
drift against the brute-force oracle. Geodetic use at the antimeridian
(x wrapping with period 360°) is handled by ``wrap_x``: build-side
points within ``radius`` of either seam get a ±period ghost copy (a
JVM-side conditional explode, one scan, ghost fraction ~2r/period), so
wrapped pairs surface through the same grid join with their exact
wrapped distance. Requires period > 2·radius, which guarantees at most
one representation of any pair qualifies — no double counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_self_join(points: DataFrame, radius: int,
                    id_col: str = "point_id",
                    x_col: str = "ix", y_col: str = "iy",
                    wrap_x: int | None = None) -> DataFrame:
    """All unordered pairs (id_a < id_b) within ``radius`` (integer planar).

    Returns (id_a, id_b, d2) with d2 the exact squared distance.
    With ``wrap_x``, a seam-crossing pair is found exactly once: probing
    either endpoint hits the other's ghost, yielding the two orderings,
    and the id_a < id_b cut keeps one.
    """
    return range_join(points, points, radius, id_col, id_col,
                      x_col, y_col, x_col, y_col, dedupe_self=True,
                      wrap_x=wrap_x)


def range_join(left: DataFrame, right: DataFrame, radius: int,
               left_id: str = "point_id", right_id: str = "point_id",
               lx: str = "ix", ly: str = "iy",
               rx: str = "ix", ry: str = "iy",
               dedupe_self: bool = False,
               wrap_x: int | None = None) -> DataFrame:
    """Grid-blocked distance join; see module docstring for the plan.

    ``dedupe_self`` emits each unordered pair once via id_a < id_b
    (self-join contract); otherwise all ordered (left, right) matches.

    ``wrap_x`` enables antimeridian ghosting: x coordinates wrap with
    that period (both sides must lie in [0, wrap_x)), and the reported
    d2 uses the wrapped x difference. Requires wrap_x > 2 * radius.
    """
    r = int(radius)
    assert r > 0, "radius must be a positive integer"

    # build side: one cell per point
    bsrc = right.select(
        F.col(right_id).alias("id_b"),
        F.col(rx).cast("long").alias("bx"),
        F.col(ry).cast("long").alias("by"),
    )
    if wrap_x is not None:
        period = int(wrap_x)
        assert period > 2 * r, "wrap period must exceed the pair diameter"
        # ghost seam-adjacent build points at ±period: a conditional
        # explode over a 3-constant array — one scan, no union of
        # re-reads, ghost volume ~2r/period of the build side
        shift = F.expr(
            f"explode(filter(array(0L, {period}L, {-period}L), s -> "
            f"s = 0L OR (s > 0L AND bx < {r}) "
            f"OR (s < 0L AND bx >= {period - r})))"
        )
        bsrc = (
            bsrc.select("id_b", "bx", "by", shift.alias("_s"))
            .select(
                "id_b",
                (F.col("bx") + F.col("_s")).alias("bx"),
                "by",
            )
        )
    b = bsrc.select(
        "id_b", "bx", "by",
        F.floor(F.col("bx") / r).cast("long").alias("cx"),
        F.floor(F.col("by") / r).cast("long").alias("cy"),
    )
    # probe side: fan out to the 3x3 neighborhood. The explode carries
    # only (id, x, y) — the 9x volume is on the narrow key triple, never
    # on payload columns (join payload back by id afterwards if needed).
    off = F.expr("explode(transform(sequence(0, 8), i -> "
                 "struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy)))")
    p = (
        left.select(
            F.col(left_id).alias("id_a"),
            F.col(lx).alias("ax"), F.col(ly).alias("ay"),
            F.floor(F.col(lx) / r).cast("long").alias("pcx"),
            F.floor(F.col(ly) / r).cast("long").alias("pcy"),
        )
        .select("id_a", "ax", "ay", "pcx", "pcy", off.alias("o"))
        .select(
            "id_a", "ax", "ay",
            (F.col("pcx") + F.col("o.dx")).alias("cx"),
            (F.col("pcy") + F.col("o.dy")).alias("cy"),
        )
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    pairs = (
        p.join(b, on=["cx", "cy"])
        .where(dx * dx + dy * dy <= F.lit(r) * F.lit(r))
    )
    if dedupe_self:
        pairs = pairs.where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", (dx * dx + dy * dy).cast("long").alias("d2")
    )
