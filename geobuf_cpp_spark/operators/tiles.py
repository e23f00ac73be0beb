"""Raster <-> vector tile materialization at zoom-bucketed resolutions.

* ``assign_tiles`` — z/x/y slippy tile ids per point (equirectangular y:
  pure arithmetic, identical in the DuckDB oracle; Web-Mercator variant
  available for real map serving, pytest-verified against known goldens).
* ``rasterize_tiles`` — groupBy(z,x,y).applyInPandas: per-tile fixed-size
  count grid (the raster), computed with one 2-D histogram per tile.
* ``vectorize_raster`` — nonzero raster pixels back to vector bbox
  polygons (wire-shaped geometry struct), one row per pixel.

Tile assignment + per-tile grouping is the layout stage for the 100 TB
case: ``repartition`` on the tile id keeps each tile's features co-located
so materialization is a single shuffle; hot tiles split by AQE skew join /
salting helpers in plans.partitioning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..functions.cells import sql_equirect_tile_x, sql_equirect_tile_y


def assign_tiles(points_df, z: int, lon_col: str = "lon", lat_col: str = "lat"):
    return points_df.withColumn("z", F.lit(z)).withColumn(
        "tx", F.expr(sql_equirect_tile_x(lon_col, z))
    ).withColumn("ty", F.expr(sql_equirect_tile_y(lat_col, z)))


RASTER_SCHEMA = "z int, tx bigint, ty bigint, n_points long, grid array<long>"


def rasterize_tiles(points_df, z: int, grid: int = 16,
                    lon_col: str = "lon", lat_col: str = "lat"):
    """Per-tile count raster: ``grid x grid`` int64 histogram, row-major."""
    tiles = assign_tiles(points_df, z, lon_col, lat_col)
    n = 1 << z

    def rasterize(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        # pixel coords within the tile (equirect fractions)
        fx = (pdf[lon_col].to_numpy(dtype=np.float64) + 180.0) / 360.0 * n - tx
        fy = (90.0 - pdf[lat_col].to_numpy(dtype=np.float64)) / 180.0 * n - ty
        px = np.clip((fx * grid).astype(np.int64), 0, grid - 1)
        py = np.clip((fy * grid).astype(np.int64), 0, grid - 1)
        hist = np.zeros((grid, grid), dtype=np.int64)
        np.add.at(hist, (py, px), 1)
        return pd.DataFrame(
            [
                {
                    "z": z,
                    "tx": tx,
                    "ty": ty,
                    "n_points": len(pdf),
                    "grid": hist.ravel().tolist(),
                }
            ]
        )

    return tiles.groupBy("tx", "ty").applyInPandas(rasterize, RASTER_SCHEMA)


VECTOR_SCHEMA = (
    "z int, tx bigint, ty bigint, px int, py int, count long, "
    "geom struct<type: tinyint, dim: tinyint, lengths: array<int>, coords: array<double>>"
)


def vectorize_raster(raster_df, grid: int = 16):
    """Nonzero raster pixels -> vector bbox polygons (wire structs)."""

    def vectorize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, tx, ty, flat in zip(pdf["z"], pdf["tx"], pdf["ty"], pdf["grid"]):
                n = 1 << int(z)
                hist = np.asarray(flat, dtype=np.int64).reshape(grid, grid)
                for py, px in zip(*np.nonzero(hist)):
                    lon0 = (tx + px / grid) / n * 360.0 - 180.0
                    lon1 = (tx + (px + 1) / grid) / n * 360.0 - 180.0
                    lat1 = 90.0 - (ty + py / grid) / n * 180.0
                    lat0 = 90.0 - (ty + (py + 1) / grid) / n * 180.0
                    ring = [lon0, lat0, lon1, lat0, lon1, lat1, lon0, lat1, lon0, lat0]
                    rows.append(
                        {
                            "z": int(z),
                            "tx": int(tx),
                            "ty": int(ty),
                            "px": int(px),
                            "py": int(py),
                            "count": int(hist[py, px]),
                            "geom": {
                                "type": 4,
                                "dim": 2,
                                "lengths": [5],
                                "coords": ring,
                            },
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "px", "py", "count", "geom"]
            )

    return raster_df.mapInPandas(vectorize, VECTOR_SCHEMA)
