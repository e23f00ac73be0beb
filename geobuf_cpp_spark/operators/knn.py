"""k-nearest-neighbor lookup over a distributed points table.

Two physical strategies, same exact semantics (ties broken by
(dist, point id) so results are deterministic):

* ``knn_broadcast`` — broadcast the query set, crossJoin + windowed top-k.
  Exact, one shuffle of (n_points x n_queries) pairs; right when the query
  set is small (the common online-serving shape).
* ``knn_cell_rings`` — the scale path mandated by BASELINE.json north_star:
  expand cell rings around each query until the kth best distance is
  certified (any point outside Chebyshev ring r lies at degree distance
  >= r * min cell extent), joining candidates by cell equi-join per round.
  Only cells near queries are ever touched, so cost is independent of the
  table's total extent.

Distance is squared Euclidean in degrees (pure arithmetic — identical in
Spark, numpy, and the DuckDB oracle; monotone in true planar distance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.cells import cell_of, cell_size_deg, ring_cells, sql_cell


def _dist2(lon_col, lat_col, qlon_col, qlat_col):
    dx = F.col(lon_col) - F.col(qlon_col)
    dy = F.col(lat_col) - F.col(qlat_col)
    return dx * dx + dy * dy


def knn_broadcast(points_df, queries_pdf: pd.DataFrame, k: int,
                  lon_col: str = "lon", lat_col: str = "lat",
                  id_cols: tuple[str, ...] = ("url", "feature_idx")):
    """Exact kNN via broadcast cross join + windowed top-k."""
    spark = points_df.sparkSession
    q = spark.createDataFrame(
        queries_pdf.rename(columns={"lon": "q_lon", "lat": "q_lat"})
    )
    pairs = points_df.crossJoin(F.broadcast(q)).withColumn(
        "dist2", _dist2(lon_col, lat_col, "q_lon", "q_lat")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), *[F.col(c).asc() for c in id_cols]
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", *id_cols, "dist2")
    )


def knn_distributed(points_df, queries_df, k: int, res: int = 7,
                    radius: int = 2,
                    lon_col: str = "lon", lat_col: str = "lat",
                    id_cols: tuple[str, ...] = ("url", "feature_idx")):
    """Exact kNN with BOTH sides as DataFrames and no driver-side loop.

    One pass: each query explodes to its Chebyshev-``radius`` cell disk
    (Arrow stage), candidates arrive by cell equi-join, a window takes the
    per-query top-k. Queries whose kth distance is not certified by the
    searched disk (kth > radius * min-cell-extent, or fewer than k
    candidates) fall back to a broadcast cross join — still set-exact, and
    at a sane ``radius`` the fallback set is a sliver. This is the shape
    that serves a large query TABLE without any driver-side loop.

    The persisted top-k intermediate (Q x k rows) lives until the session
    ends or the caller runs ``spark.catalog.clearCache()`` — long-lived
    sessions own their cache.
    """
    from ..functions.cells import sql_ring_cells

    min_extent, _ = cell_size_deg(res)
    certify2 = float((radius * min_extent) ** 2)

    # the query-side disk explode is a pure JVM array expression — no
    # Python stage anywhere in the certified path
    disk = queries_df.select(
        "query_id",
        F.col("lat").alias("q_lat"),
        F.col("lon").alias("q_lon"),
        F.explode(F.expr(sql_ring_cells("lat", "lon", res, radius))).alias("cell"),
    )
    pts = points_df.withColumn("cell", F.expr(sql_cell(lat_col, lon_col, res)))
    cand = pts.join(disk, "cell").withColumn(
        "dist2", _dist2(lon_col, lat_col, "q_lon", "q_lat")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), *[F.col(c).asc() for c in id_cols]
    )
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", *id_cols, "dist2")
    )
    # topk (Q x k rows) feeds THREE branches (certified join, the
    # certification aggregate, and the fallback's left-anti); without a
    # persist each branch re-executes the candidate join — 4 scans of the
    # points table in the final plan, which at 100 TB is the whole cost.
    # Persisted, the table is scanned twice: candidate join + fallback.
    topk = topk.persist()
    per_query = topk.groupBy("query_id").agg(
        F.count("*").alias("_n"), F.max("dist2").alias("_kth")
    )
    # STRICT bound: a point just outside the searched disk can sit at
    # exactly radius*min_extent and, under the (dist2, id) tie-break,
    # displace the kth result — ties at the certification radius must fall
    # back to the exact path.
    certified_ids = per_query.filter(
        (F.col("_n") >= k) & (F.col("_kth") < F.lit(certify2))
    ).select("query_id")
    certified = topk.join(F.broadcast(certified_ids), "query_id")

    # Lazy in-plan fallback (no driver-side toPandas/eager job): the
    # uncertified queries — normally an empty sliver — broadcast into a
    # cross join with the full table, window top-k, union. An empty
    # broadcast side makes the nested-loop join a per-partition no-op.
    uncertified_q = queries_df.join(
        F.broadcast(certified_ids), "query_id", "left_anti"
    ).selectExpr("query_id", "lat AS q_lat", "lon AS q_lon")
    fb_pairs = points_df.crossJoin(F.broadcast(uncertified_q)).withColumn(
        "dist2", _dist2(lon_col, lat_col, "q_lon", "q_lat")
    )
    fallback = (
        fb_pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", *id_cols, "dist2")
    )
    return certified.unionByName(fallback)


def knn_cell_rings(points_df, queries_pdf: pd.DataFrame, k: int, res: int = 7,
                   lon_col: str = "lon", lat_col: str = "lat",
                   id_cols: tuple[str, ...] = ("url", "feature_idx"),
                   max_rounds: int = 6):
    """Exact kNN via expanding cell-ring candidate joins.

    Each round r broadcasts the (query_id, cell) disk of Chebyshev radius
     2^r around the unsatisfied queries, equi-joins candidates, and keeps a
    per-query top-k. A query is satisfied once its kth distance is below
    the certification radius of the already-searched disk. Unsatisfied
    queries after ``max_rounds`` (pathologically sparse data) fall back to
    the broadcast strategy — semantics stay exact.
    """
    min_extent, _ = cell_size_deg(res)
    pts = points_df.withColumn("cell", F.expr(sql_cell(lat_col, lon_col, res)))
    pts.persist()
    try:
        remaining = queries_pdf.copy()
        remaining["q_cell"] = cell_of(
            remaining["lat"].to_numpy(), remaining["lon"].to_numpy(), res
        )
        spark = points_df.sparkSession
        done: list = []
        radius = 1
        for _ in range(max_rounds):
            if remaining.empty:
                break
            disk_rows = []
            for qid, qlat, qlon, qcell in zip(
                remaining["query_id"], remaining["lat"],
                remaining["lon"], remaining["q_cell"],
            ):
                for cell in ring_cells(int(qcell), res, radius):
                    disk_rows.append((int(qid), float(qlat), float(qlon), int(cell)))
            disk = spark.createDataFrame(
                pd.DataFrame(disk_rows, columns=["query_id", "q_lat", "q_lon", "cell"])
            )
            cand = pts.join(F.broadcast(disk), "cell").withColumn(
                "dist2", _dist2(lon_col, lat_col, "q_lon", "q_lat")
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("dist2").asc(), *[F.col(c).asc() for c in id_cols]
            )
            topk = (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", *id_cols, "dist2")
                .toPandas()
            )
            # certification: points beyond Chebyshev ring `radius` are at
            # degree distance >= radius * min_extent
            certify = (radius * min_extent) ** 2
            counts = topk.groupby("query_id").agg(
                n=("rank", "size"), kth=("dist2", "max")
            )
            # strict <: a tie at the certification radius could be displaced
            # by an unseen point at exactly that distance with a smaller id
            ok_ids = set(
                counts[(counts["n"] >= k) & (counts["kth"] < certify)].index
            )
            if ok_ids:
                done.append(topk[topk["query_id"].isin(ok_ids)])
                remaining = remaining[~remaining["query_id"].isin(ok_ids)]
            radius *= 2
        if not remaining.empty:
            fb = knn_broadcast(
                points_df, remaining.drop(columns=["q_cell"]), k,
                lon_col=lon_col, lat_col=lat_col, id_cols=id_cols,
            ).toPandas()
            done.append(fb)
        out = pd.concat(done, ignore_index=True) if done else pd.DataFrame(
            columns=["query_id", "rank", *id_cols, "dist2"]
        )
        return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    finally:
        pts.unpersist()
