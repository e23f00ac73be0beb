"""Point-in-polygon join: cell-prefilter equi-join + exact ray-crossing refine.

Two-phase plan mandated by BASELINE.json north_rule:

1. **Coarse**: cover each admin polygon's bbox with grid cells at ``res``
   (driver-side — the admin set is the small dimension), broadcast the
   (cell, admin_id) covering, and equi-join against the points' cell column.
   Catalyst turns this into a BroadcastHashJoin — no shuffle of the big side.
2. **Refine**: exact even-odd ray-crossing test in an Arrow-batched
   ``mapInPandas``, vectorized per admin_id group within each batch.

The coarse phase can only produce false positives (bbox cover ⊇ polygon),
never false negatives, so refine output equals the exact join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..functions.cells import cover_bbox, cover_polygon, sql_cell
from ..functions.geometry import pip_mask, wire_bbox, wire_rings


def polygon_coverings(admin_pdf: pd.DataFrame, res: int,
                      exact: bool = False) -> pd.DataFrame:
    """(admin_id, cell) cover rows for the broadcast side.

    ``exact=True`` keeps only cells actually intersecting the polygon
    (functions.cells.cover_polygon) — worth it when polygons are much
    smaller than their bbox (coastlines, multipolygons); bbox cover is
    cheaper to build for compact shapes.
    """
    rows = []
    for admin_id, geom in zip(admin_pdf["admin_id"], admin_pdf["geom"]):
        if exact:
            cells = cover_polygon(
                wire_rings(geom["type"], geom["dim"], geom["lengths"], geom["coords"]),
                res,
            )
        else:
            lon0, lat0, lon1, lat1 = wire_bbox(geom["dim"], geom["coords"])
            cells = cover_bbox(lat0, lat1, lon0, lon1, res)
        for cell in cells:
            rows.append((int(admin_id), int(cell)))
    return pd.DataFrame(rows, columns=["admin_id", "cell"])


def _rings_by_admin(admin_pdf: pd.DataFrame) -> dict[int, list[np.ndarray]]:
    return {
        int(admin_id): wire_rings(
            geom["type"], geom["dim"], geom["lengths"], geom["coords"]
        )
        for admin_id, geom in zip(admin_pdf["admin_id"], admin_pdf["geom"])
    }


def pip_join_large(points_df, polygons_df, res: int = 8,
                   lon_col: str = "lon", lat_col: str = "lat",
                   point_keys: tuple[str, ...] = ("url", "feature_idx")):
    """PIP join where BOTH sides are distributed tables.

    The broadcast variant (``pip_join``) assumes the polygon side fits on
    the driver; at 100 TB the polygon table can itself be huge (parcel or
    building footprints), so here:

    1. each polygon row explodes to its bbox cell cover in an Arrow stage
       (cover size bounded by the polygon's extent at ``res``);
    2. points get their cell column JVM-side (one expression, no UDF);
    3. a shuffle equi-join on cell co-locates candidates — AQE splits
       skewed cells; optionally pre-salt hot cells upstream;
    4. exact refine runs co-grouped per cell with the polygon geometry
       carried alongside, so no second pass over the polygon table.

    ``polygons_df`` needs (admin_id, geom wire-struct). Output: point key
    columns + admin_id, exact (bbox cover ⊇ polygon ⇒ no false negatives;
    refine removes false positives). Duplicate candidates (a point meeting
    the same polygon in several cover cells) are impossible: a point lies
    in exactly one cell at ``res``.
    """
    from typing import Iterator

    spark = points_df.sparkSession

    cover_schema = (
        "admin_id long, cell long, "
        "geom struct<type: tinyint, dim: tinyint, lengths: array<int>, coords: array<double>>"
    )

    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for admin_id, geom in zip(pdf["admin_id"], pdf["geom"]):
                lon0, lat0, lon1, lat1 = wire_bbox(geom["dim"], geom["coords"])
                for cell in cover_bbox(lat0, lat1, lon0, lon1, res):
                    rows.append(
                        {"admin_id": int(admin_id), "cell": int(cell), "geom": geom}
                    )
            yield pd.DataFrame(rows, columns=["admin_id", "cell", "geom"])

    poly_cover = polygons_df.select("admin_id", "geom").mapInPandas(
        cover, cover_schema
    )
    pts = points_df.withColumn("cell", F.expr(sql_cell(lat_col, lon_col, res)))
    candidates = pts.join(poly_cover, "cell")

    out_cols = [*point_keys, "admin_id"]

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.geometry import wire_rings

        for pdf in batches:
            if pdf.empty:
                yield pdf[out_cols]
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[lon_col].to_numpy(dtype=np.float64)
            py = pdf[lat_col].to_numpy(dtype=np.float64)
            for admin_id, idx in pdf.groupby("admin_id").indices.items():
                g = pdf["geom"].iloc[idx[0]]
                rings = wire_rings(g["type"], g["dim"], g["lengths"], g["coords"])
                keep[idx] = pip_mask(px[idx], py[idx], rings)
            yield pdf.loc[keep, out_cols]

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in candidates.schema.fields
        if f.name in out_cols
    )
    return candidates.mapInPandas(refine, out_schema)


def pip_join(points_df, admin_pdf: pd.DataFrame, res: int = 8,
             lon_col: str = "lon", lat_col: str = "lat",
             exact_cover: bool = False, n_salt: int = 1):
    """Exact PIP join of a points DataFrame against a small polygon table.

    ``admin_pdf`` is a pandas frame (admin_id, geom wire-struct) — the
    broadcast dimension. Returns points rows + ``admin_id``, one output row
    per (point, containing polygon).

    The broadcast hash join itself has no reducers — candidates stay in the
    points' partitions — so skew here is COMPUTE skew: a partition dense in
    hot-cell points does disproportionate refine work. ``n_salt > 1`` opts
    into one explicit shuffle of the candidate rows on (cell, salt) — salt
    from the row position, so a hot cell's candidates genuinely fan out
    over ``n_salt`` reducers before the refine stage. Results are identical
    (refine is row-local); the default skips the shuffle because on
    roughly-uniform corpora the scan partitioning is already balanced.
    """
    spark = points_df.sparkSession
    cover_pdf = polygon_coverings(admin_pdf, res, exact_cover)
    rings = _rings_by_admin(admin_pdf)

    pts = points_df.withColumn("cell", F.expr(sql_cell(lat_col, lon_col, res)))
    cover = spark.createDataFrame(cover_pdf)
    candidates = pts.join(F.broadcast(cover), "cell")
    if n_salt > 1:
        from ..plans.partitioning import with_salt

        parallelism = spark.sparkContext.defaultParallelism
        candidates = (
            with_salt(candidates, n_salt)
            .repartition(parallelism, F.col("cell"), F.col("_salt"))
            .drop("_salt")
        )

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[lon_col].to_numpy(dtype=np.float64)
            py = pdf[lat_col].to_numpy(dtype=np.float64)
            for admin_id, idx in pdf.groupby("admin_id").indices.items():
                keep[idx] = pip_mask(px[idx], py[idx], rings[int(admin_id)])
            yield pdf[keep]

    return candidates.mapInPandas(refine, out_schema).drop("cell")
