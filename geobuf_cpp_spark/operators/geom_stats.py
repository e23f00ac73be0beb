"""Geometry statistics over wire-struct columns (Arrow-batched).

``areas`` computes the planar shoelace area per polygon row — exact for
integer-valued coordinates (every product/sum representable), which the
``admin_areas`` gate exploits: the Spark side runs the general shoelace
over the REAL wire geometry, the DuckDB oracle the closed-form box area;
bit-equality holds because both reduce to exact float arithmetic.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..functions.geometry import polygon_area, wire_rings


def areas(polygons_df, id_col: str = "admin_id", geom_col: str = "geom"):
    """(id, area) per polygon row."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for pid, geom in zip(pdf[id_col], pdf[geom_col]):
                rings = wire_rings(
                    geom["type"], geom["dim"], geom["lengths"], geom["coords"]
                )
                ids.append(int(pid))
                out.append(polygon_area(rings))
            yield pd.DataFrame({id_col: ids, "area": out})

    return polygons_df.select(id_col, geom_col).mapInPandas(
        gen, f"{id_col} long, area double"
    )
