"""Grid-density clustering (DBSCAN-lite) over the hierarchical cell index.

The classic geospatial clustering ask — "group the dense areas" — done the
way it scales: instead of the O(n^2) pairwise epsilon-neighborhood DBSCAN
computes, points are first aggregated onto the cell grid (one shuffle, the
same cell ids every other operator in this engine uses), cells below
``min_pts`` are discarded as noise, and the surviving *dense* cells are
connected through 8-neighbor adjacency into components. Cluster identity =
the min cell id of the component, the same keeper convention as fuzzy
dedup (`operators/dedup.py:dedup_clusters`), whose Pregel-style min-label
propagation this reuses verbatim.

Scale shape: the candidate-edge step is NOT a self-join on coordinate
deltas (that is what the DuckDB oracle does, and it is quadratic in dense
cells). Each dense cell emits its 4 lexicographically-forward neighbor
ids by pure integer arithmetic and equi-joins against the dense-cell set
— O(dense cells) rows shuffled on an integer key, broadcast-free,
codegen-friendly. At 100 TB the dense-cell table is orders of magnitude
smaller than the point table, and the fixpoint loop is bounded by the
component diameter (GraphX/Pregel shape), never the corpus size.

The reference engine has no clustering operator; this is part of the
mandated analytics surface (BASELINE.json north_rule: cell-index rollups
and spatial joins at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geobuf_cpp_spark.functions.cells import RES_BASE, sql_cell
from geobuf_cpp_spark.operators.dedup import dedup_clusters

# lexicographically-forward neighbor offsets: each undirected 8-neighbor
# edge is generated exactly once ((dy,dx) > (0,0) in (y,x) order)
_FWD_OFFSETS = ((0, 1), (1, -1), (1, 0), (1, 1))


def dense_cells(points_df: DataFrame, res: int, min_pts: int,
                lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Aggregate points onto the grid and keep cells with >= min_pts.

    One map-side-combined shuffle on the cell id; everything below the
    density threshold is noise and never reaches the clustering step.
    """
    cell = F.expr(sql_cell(lat_col, lon_col, res))
    return (
        points_df.groupBy(cell.alias("cell"))
        .agg(F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= min_pts)
    )


def _neighbor_edges(dense: DataFrame, res: int) -> DataFrame:
    """Forward 8-neighbor edges among dense cells, by integer arithmetic.

    iy/ix are recovered from the cell id (`functions/cells.py` layout:
    res*2^52 + iy*2^res + ix), each cell emits its 4 forward neighbors
    (border-guarded, no wraparound), and a single equi-join on the
    neighbor id keeps only neighbors that are themselves dense.
    """
    n = 1 << res
    base = res * RES_BASE
    d = dense.select(
        "cell",
        ((F.col("cell") - F.lit(base)) / F.lit(n)).cast("long").alias("iy"),
        ((F.col("cell") - F.lit(base)) % F.lit(n)).alias("ix"),
    )
    offs = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy, dx in _FWD_OFFSETS
    ])
    nbr = (
        d.select("cell", "iy", "ix", F.explode(offs).alias("o"))
        .withColumn("ny", F.col("iy") + F.col("o.dy"))
        .withColumn("nx", F.col("ix") + F.col("o.dx"))
        .filter(
            (F.col("ny") >= 0) & (F.col("ny") < n)
            & (F.col("nx") >= 0) & (F.col("nx") < n)
        )
        .select(
            F.col("cell").alias("id_a"),
            (F.lit(base) + F.col("ny") * F.lit(n) + F.col("nx")).alias("id_b"),
        )
    )
    return nbr.join(
        dense.select(F.col("cell").alias("id_b")), "id_b", "inner"
    ).select("id_a", "id_b")


GRID_UF_MAX_CELLS = 1 << 22  # 4^11: grids at res <= 11 have a provably
                             # bounded cell table (<= 4M rows INDEPENDENT
                             # of corpus size), small enough for the
                             # driver union-find fast path


def _driver_union_find(cells, res: int):
    """Vectorized 8-neighbor components over a BOUNDED dense-cell list.

    Input size is capped by the grid (4^res), never the corpus — the
    points were already aggregated away — so this is a bounded driver
    computation (same contract as the bounded k-means sample in
    operators/ann.py), not a collect of distributed data. Neighbor
    lookups are numpy searchsorted against the sorted id array; the
    union-find itself is path-halving over <= 4^res nodes.
    """
    import numpy as np

    ids = np.sort(np.asarray(cells, dtype=np.int64))
    n = 1 << res
    base = res * RES_BASE
    iy, ix = (ids - base) // n, (ids - base) % n
    parent = np.arange(len(ids))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for dy, dx in _FWD_OFFSETS:
        ny, nx = iy + dy, ix + dx
        ok = (ny >= 0) & (ny < n) & (nx >= 0) & (nx < n)
        nbr_id = base + ny * n + nx
        pos = np.searchsorted(ids, nbr_id)
        pos_ok = ok & (pos < len(ids))
        hit = np.flatnonzero(pos_ok)
        hit = hit[ids[pos[hit]] == nbr_id[hit]]
        for a, b in zip(hit, pos[hit]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(ids))])
    # min id per component == id of the root (ids sorted, unions keep min)
    return [(int(c), int(ids[r])) for c, r in zip(ids, roots)]


def grid_cluster(points_df: DataFrame, res: int, min_pts: int,
                 lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """DBSCAN-lite: dense cells -> 8-neighbor components -> cluster ids.

    Returns (cell, n_points, cluster_id) for every dense cell;
    cluster_id is the min cell id of the connected component, so
    singleton dense cells label themselves.

    Adaptive strategy: after the density aggregation the cell table is
    bounded by 4^res, so for res <= 11 the component step runs as a
    bounded driver union-find (one collect of <= 4M ids, zero fixpoint
    jobs); at finer resolutions it falls back to the distributed
    pointer-jumping loop shared with fuzzy dedup. Both paths produce
    identical labels (pytest-asserted).
    """
    dense = dense_cells(points_df, res, min_pts, lat_col, lon_col)
    dense = dense.persist()
    if (1 << (2 * res)) <= GRID_UF_MAX_CELLS:
        cells = [r["cell"] for r in dense.select("cell").collect()]
        spark = points_df.sparkSession
        labels = spark.createDataFrame(
            _driver_union_find(cells, res), "cell long, cluster_id long"
        )
        return dense.join(F.broadcast(labels), "cell", "inner").select(
            "cell", "n_points", "cluster_id"
        )
    edges = _neighbor_edges(dense, res)
    labels = dedup_clusters(dense.withColumnRenamed("cell", "doc_id"),
                            edges, id_col="doc_id")
    out = (
        dense.join(
            labels.withColumnRenamed("doc_id", "cell"), "cell", "inner"
        ).select("cell", "n_points", "cluster_id")
    )
    return out


GEO_CELL_BASE = 1_000_000   # cell_id = band * BASE + cx (cx < 36000)


def _driver_union_find_pairs(node_ids, pairs):
    """Bounded driver union-find over an explicit edge list.

    Same contract as ``_driver_union_find`` (path-halving, unions keep
    the min id as root because ids are processed sorted), but takes
    arbitrary (id_a, id_b) pairs instead of deriving grid adjacency —
    the component engine for bounded graphs whose adjacency rule is
    computed distributed (geodetic band overlap, crossing graphs).
    Returns [(id, min-id-of-component)] for every node.
    """
    import numpy as np

    ids = np.sort(np.asarray(node_ids, dtype=np.int64))
    parent = np.arange(len(ids))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    pos_a = np.searchsorted(ids, np.asarray([a for a, _ in pairs],
                                            dtype=np.int64))
    pos_b = np.searchsorted(ids, np.asarray([b for _, b in pairs],
                                            dtype=np.int64))
    for a, b in zip(pos_a, pos_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(int(ids[i]), int(ids[find(i)])) for i in range(len(ids))]


def grid_cluster_geo(points_df: DataFrame, radius_cdeg: int,
                     min_pts: int) -> DataFrame:
    """Geodetic DBSCAN-lite: density clustering on the SPHERE's honest
    grid — latitude bands of height ``radius_cdeg`` with per-band
    longitude cell widths from ``geo_band_widths`` (meridian
    convergence: cells widen toward the poles), so a cluster's spatial
    extent means the same ground distance at 80 deg latitude as at the
    equator, which the planar `grid_cluster` grid gets wrong by 1/cos.

    Dense cells (>= min_pts) connect when their longitude intervals
    overlap after expanding a cell by one own-width on each side:
    within a band that is exactly the +1-forward neighbor join (O(dense)
    id enumeration, no pair scan); across adjacent bands the candidate
    cx' range under the other band's width is enumerated by exact floor
    division ((cx-1)*w1 and (cx+2)*w1 - 1 over w2 — doubles are exact
    here: quotients are either exact integers or >= 2^-16 from one) and
    equi-joined, a bounded <= 3*w1/w2 + 2 fan-out per cell. Like the
    planar sibling, borders are guarded and there is NO antimeridian
    wrap for adjacency (a cluster crossing +-180 splits — documented
    family convention; the geodetic distance JOINS do ghost the seam).
    Components via the shared min-label engine; cluster_id = min
    cell_id (band * 10^6 + cx).

    Returns (band, cx, n_points, cluster_id) for every dense cell.
    """
    from geobuf_cpp_spark.operators.range_join import geo_band_widths

    r = int(radius_cdeg)
    spark = points_df.sparkSession
    band_widths = geo_band_widths(r)
    bands = spark.createDataFrame(band_widths, "band long, w long")
    dense = (
        points_df.withColumn("band", F.expr(f"iy div {r}"))
        .join(F.broadcast(bands), "band")
        .groupBy("band", "w", F.expr("ix div w").alias("cx"))
        .agg(F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= min_pts)
        .withColumn("cell_id",
                    F.expr(f"band * {GEO_CELL_BASE} + cx"))
        .persist()
    )
    nodes = dense.select(F.col("cell_id").alias("doc_id"))
    same = (
        dense.selectExpr("cell_id AS id_a", "band",
                         "cx + 1 AS cx_next")
        .join(dense.selectExpr("cell_id AS id_b", "band",
                               "cx AS cx_next"),
              ["band", "cx_next"])
        .select("id_a", "id_b")
    )
    fdiv = ("CAST(FLOOR(CAST({n} AS DOUBLE) / w2) AS BIGINT)")
    up = (
        dense.selectExpr(
            "cell_id AS id_a", "band + 1 AS band_b", "cx", "w AS w1")
        .join(F.broadcast(bands.selectExpr("band AS band_b",
                                           "w AS w2")), "band_b")
        .selectExpr(
            "id_a", "band_b",
            "explode(sequence(GREATEST("
            + fdiv.format(n="(cx - 1) * w1") + ", 0), "
            + fdiv.format(n="(cx + 2) * w1 - 1") + ")) AS cx_b")
        .join(dense.selectExpr("cell_id AS id_b", "band AS band_b",
                               "cx AS cx_b"),
              ["band_b", "cx_b"])
        .select("id_a", "id_b")
    )
    edges = same.unionByName(up).selectExpr("id_a", "id_b")
    # Adaptive component strategy, same contract as the planar sibling:
    # the dense-cell table is bounded by the GRID (sum over bands of
    # 36000 cdeg / w_band — a geometry constant, never the corpus), so
    # up to the planar UF cap the components run as a bounded driver
    # union-find over the COLLECTED edge list (the adjacency itself
    # stays a distributed join above). Beyond the cap fall back to the
    # distributed min-label fixpoint — correct but linear-round-prone
    # on near-percolation grids (observed ~1 band/round label crawl at
    # sf0.1: the banded interval graph defeats pointer-jumping's
    # log-diameter bound in practice, which is why the bounded path is
    # the default here).
    # the dense-cell count is bounded by the GRID itself (<= 360 deg of
    # longitude over each band's width), a geometry constant the planar
    # sibling also guards on STATICALLY — so the driver-UF eligibility
    # check needs no count job at all when the whole grid fits the cap;
    # the dynamic count remains only for geometries whose full grid
    # exceeds it (tiny radii), where dense occupancy may still fit.
    grid_bound = sum(36000 // w + 2 for _, w in band_widths)
    n_dense = grid_bound if grid_bound <= GRID_UF_MAX_CELLS \
        else dense.count()
    if n_dense <= GRID_UF_MAX_CELLS:
        node_ids = [r["cell_id"] for r in
                    dense.select("cell_id").collect()]
        pair_rows = [(r["id_a"], r["id_b"]) for r in edges.collect()]
        labels = spark.createDataFrame(
            _driver_union_find_pairs(node_ids, pair_rows),
            "cell_id long, cluster_id long")
        return dense.join(F.broadcast(labels), "cell_id").select(
            "band", "cx", "n_points", "cluster_id")
    labels = dedup_clusters(nodes, edges)
    return dense.join(
        labels.withColumnRenamed("doc_id", "cell_id"), "cell_id"
    ).select("band", "cx", "n_points", "cluster_id")
