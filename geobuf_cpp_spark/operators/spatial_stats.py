"""Spatial autocorrelation (global Moran's I, local Getis-Ord Gi*) in
exact integer parts.

Moran's I is THE summary statistic for "is this variable spatially
clustered?" — for a web-geo corpus, whether geotag density concentrates
(I -> 1), disperses (I -> -1), or scatters randomly (I ~ 0). Over the
engine's grid: x_i = point count of occupied cell i, weights w_ij = 1
for 8-neighbor adjacency (occupied cells only, planar — no antimeridian
adjacency, documented), and

    I = (N / W) * sum_ij w_ij (x_i - xbar)(x_j - xbar)
               / sum_i (x_i - xbar)^2.

xbar = T/N is rational, so the engine multiplies through by N^2 and
reports EXACT integer parts: num = sum_ij w_ij (N x_i - T)(N x_j - T)
and den = sum_i (N x_i - T)^2 (both scaled by the same N^2, which
cancels), plus N and W; the caller resolves I = (N * num) / (W * den)
in floats. Products are DECIMAL(38,0) shipped as digit strings (same
discipline as group_trend / hll_estimate).

Plan: one grid aggregation (map-side combined), the forward-neighbor
equi-join from `clustering._neighbor_edges` (each undirected pair
generated once by integer arithmetic, never a coordinate self-join;
symmetric products doubled), and three single-row aggregates broadcast
together. O(occupied cells) work after the one corpus-scan shuffle —
the cell table is bounded by 4^res regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import _neighbor_edges, dense_cells


def morans_i_parts(points_df: DataFrame, res: int,
                   lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """One row: (n_cells, w_pairs, num, den) — exact Moran's I parts."""
    # the cell table feeds four consumers (totals, both join sides, the
    # denominator); a lazy localCheckpoint materializes the one corpus
    # scan + grid shuffle exactly once (bounded: <= 4^res rows)
    cells = dense_cells(
        points_df, res, 1, lat_col, lon_col).localCheckpoint(eager=False)
    tot = cells.agg(
        F.sum("n_points").alias("t_sum"),
        F.count("*").alias("n_cells"),
    )

    def dev(xcol):
        # N * x_i - T, exact in DECIMAL(38,0)
        return (
            F.col("n_cells").cast("decimal(38,0)") * xcol.cast("decimal(38,0)")
            - F.col("t_sum").cast("decimal(38,0)")
        )

    edges = _neighbor_edges(cells, res)
    xa = cells.select(
        F.col("cell").alias("id_a"), F.col("n_points").alias("x_a"))
    xb = cells.select(
        F.col("cell").alias("id_b"), F.col("n_points").alias("x_b"))
    num = (
        edges.join(xa, "id_a").join(xb, "id_b")
        .crossJoin(F.broadcast(tot))
        .agg(
            (F.lit(2).cast("decimal(38,0)")
             * F.sum(dev(F.col("x_a")) * dev(F.col("x_b"))))
            .cast("decimal(38,0)").cast("string").alias("num"),
            (F.count("*") * 2).cast("long").alias("w_pairs"),
        )
    )
    den = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(dev(F.col("n_points")) * dev(F.col("n_points")))
            .cast("decimal(38,0)").cast("string").alias("den"),
            F.max("n_cells").cast("long").alias("n_cells"),
        )
    )
    return num.crossJoin(den).select("n_cells", "w_pairs", "num", "den")


def getis_ord_parts(points_df: DataFrame, res: int,
                    lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Local Getis-Ord Gi* hotspot parts per occupied grid cell.

    Moran's I answers "is density clustered AT ALL?"; Gi* answers the
    question every heat-map actually asks — WHICH cells are the hot
    spots. For cell i with queen neighborhood N(i) (8-adjacent occupied
    cells, self included — the * variant), x_j = point count:

        Gi* = sum_{j in N(i)} x_j  vs  its expectation k_i * xbar,

    so the exact-integer z-score numerator is
    ``gi_num = N * local_sum_i - k_i * T`` (scaled by N, which the
    caller's denominator shares). The sqrt-bearing denominator needs
    only the globals shipped on every row: N (n_cells), T (t_sum) and
    sum x^2 (ssq, DECIMAL(38,0) as a digit string — x^2 overflows
    BIGINT at full corpus scale). Same occupied-cells-only weight
    convention as `morans_i_parts` (empty cells carry no weight),
    documented rather than the all-lattice variant.

    Plan: one map-side-combined grid aggregation, the forward-neighbor
    integer equi-join symmetrized (plus the self edge), one bounded
    groupBy on the cell id, and the single-row totals broadcast onto
    every cell row. O(occupied cells) work after the corpus scan; the
    cell table is bounded by 4^res regardless of corpus size. gi_num
    stays in BIGINT: N <= 4^res and local sums are corpus counts, so
    the product is < 2^16 * 2^40 even at 10^12 points.
    """
    cells = dense_cells(
        points_df, res, 1, lat_col, lon_col).localCheckpoint(eager=False)
    tot = cells.agg(
        F.sum("n_points").alias("t_sum"),
        F.count("*").alias("n_cells"),
        F.sum(
            F.col("n_points").cast("decimal(38,0)") * F.col("n_points")
        ).cast("decimal(38,0)").cast("string").alias("ssq"),
    )
    edges = _neighbor_edges(cells, res).localCheckpoint(eager=False)
    sym = (
        edges.select("id_a", "id_b")
        .unionAll(edges.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
        .unionAll(cells.select(
            F.col("cell").alias("id_a"), F.col("cell").alias("id_b")))
    )
    xb = cells.select(
        F.col("cell").alias("id_b"), F.col("n_points").alias("x_b"))
    loc = (
        sym.join(xb, "id_b")
        .groupBy("id_a")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.sum("x_b").cast("long").alias("local_sum"),
        )
    )
    return (
        loc.crossJoin(F.broadcast(tot))
        .select(
            F.col("id_a").alias("cell"),
            "k",
            "local_sum",
            (F.col("n_cells") * F.col("local_sum")
             - F.col("k") * F.col("t_sum")).cast("long").alias("gi_num"),
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("t_sum").cast("long").alias("t_sum"),
            "ssq",
        )
    )
