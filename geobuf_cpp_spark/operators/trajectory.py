"""Trajectory (GPS-track) statistics — per-entity path length over time.

A spatio-temporal primitive the reference's point encoding feeds (a
geobuf LineString IS a stored trajectory; cf. the delta-coded coord
stream, src/geobuf/geobuf.cpp populateLine): order an entity's points by
event time and sum consecutive step lengths. On Spark this is one key
shuffle (partition by entity) + a lag window — no join, no Python.

Arithmetic portability: coordinates are integer planar (centidegrees),
so the squared step is exact BIGINT; the step length uses
floor(sqrt(d2)), which is deterministic cross-engine because IEEE-754
sqrt is correctly rounded and d2 < 2^53. Summing the floored integer
steps keeps the per-entity total exact — no float accumulation order
dependence, unlike summing raw sqrt values.

At 100 TB the plan is scale-right: the only exchange is the entity-key
hash partition; the window is a per-partition sort (spillable); skewed
entities (one user with 10^9 pings) are bounded by the narrow
(entity, ts, x, y) projection entering the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _floor_isqrt(d2col):
    """floor(sqrt(n)) for exact-integer n < 2^53 — portable (IEEE sqrt
    is correctly rounded, so both engines see the identical double)."""
    return F.floor(F.sqrt(d2col.cast("double"))).cast("long")


def path_stats(points: DataFrame,
               entity_col: str = "user_id",
               ts_col: str = "ts",
               order_tiebreak: str = "event_id",
               x_col: str = "ix", y_col: str = "iy") -> DataFrame:
    """Per-entity track stats: steps, exact integer path length, net
    displacement (floor of straight-line start→end distance).

    Ordering is (ts, tiebreak) so duplicate timestamps are deterministic.
    Output: (entity_col, n_steps, path_len, net_disp), all BIGINT.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_tiebreak)
    lagged = points.select(
        entity_col, ts_col, order_tiebreak,
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y"),
    ).select(
        entity_col, "_x", "_y",
        F.lag("_x").over(w).alias("_px"),
        F.lag("_y").over(w).alias("_py"),
        F.row_number().over(w).alias("_rn"),
    )
    dx = F.col("_x") - F.col("_px")
    dy = F.col("_y") - F.col("_py")
    stepped = lagged.withColumn("_step", _floor_isqrt(dx * dx + dy * dy))
    fx = F.min_by("_x", F.col("_rn"))   # first point (rn==1)
    fy = F.min_by("_y", F.col("_rn"))
    lx = F.max_by("_x", F.col("_rn"))   # last point (max rn)
    ly = F.max_by("_y", F.col("_rn"))
    return stepped.groupBy(entity_col).agg(
        (F.count("*") - 1).cast("long").alias("n_steps"),
        F.coalesce(F.sum("_step"), F.lit(0)).cast("long").alias("path_len"),
        _floor_isqrt((fx - lx) * (fx - lx) + (fy - ly) * (fy - ly))
        .alias("net_disp"),
    )


def od_matrix(pings: DataFrame, cell_w: int = 2250, cell_h: int = 2125,
              nx: int = 16, entity_col: str = "user_id",
              ts_col: str = "ts", tie_col: str = "event_id",
              x_col: str = "ix", y_col: str = "iy") -> DataFrame:
    """Origin-destination matrix: per-entity cell-to-cell transition
    counts — the standard mobility-analytics rollup (where do trips
    between zones actually flow?).

    Each ping lands in a coarse zone ``cell = (x div cell_w) + nx *
    (y div cell_h)``; consecutive pings of the same entity (ordered by
    timestamp, ties broken by the id column so the order is total and
    cross-engine deterministic) emit one transition; stays
    (from == to) are excluded — an OD matrix counts movements. Output:
    (cell_from, cell_to, n_trips, n_users). Integer division on
    nonnegative coords, so Spark ``div`` == DuckDB ``//``.

    Plan: ONE entity-key hash exchange feeds the lag window (a
    per-partition spillable sort), then a map-side-combined groupBy on
    the (from, to) pair — zone pairs are bounded by (grid size)^2
    however many pings flow through. The n_users distinct count rides
    the same aggregation (partial distinct on the pair key)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, tie_col)
    cells = pings.select(
        entity_col, ts_col, tie_col,
        (F.expr(f"{x_col} div {cell_w}")
         + nx * F.expr(f"{y_col} div {cell_h}")).alias("cell"),
    )
    t = cells.withColumn("prev", F.lag("cell").over(w))
    return (
        t.filter(F.col("prev").isNotNull()
                 & (F.col("prev") != F.col("cell")))
        .groupBy(F.col("prev").alias("cell_from"),
                 F.col("cell").alias("cell_to"))
        .agg(
            F.count("*").cast("long").alias("n_trips"),
            F.countDistinct(entity_col).cast("long").alias("n_users"),
        )
    )
