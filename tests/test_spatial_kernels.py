"""Pure-numpy spatial kernel tests (no Spark): cells, tiles, PIP."""

import numpy as np
import pytest

from geobuf_cpp_spark.functions import cells as C
from geobuf_cpp_spark.functions import geometry as G


def test_cell_roundtrip_center():
    lat = np.array([40.71, -33.86, 0.0, 89.999, -90.0])
    lon = np.array([-74.0, 151.2, 0.0, 179.999, -180.0])
    for res in (2, 8, 15):
        cell = C.cell_of(lat, lon, res)
        clat, clon = C.cell_center(cell, res)
        dlat, dlon = C.cell_size_deg(res)
        assert np.all(np.abs(clat - lat) <= dlat)
        assert np.all(np.abs(clon - lon) <= dlon)


def test_cell_hierarchy_exact():
    lat = np.linspace(-89, 89, 50)
    lon = np.linspace(-179, 179, 50)
    child = C.cell_of(lat, lon, 12)
    parent_direct = C.cell_of(lat, lon, 9)
    assert np.array_equal(C.cell_parent(child, 12, 9), parent_direct)


def test_cell_res_disjoint():
    # same location, different res -> different id ranges
    c8 = C.cell_of(10.0, 10.0, 8)
    c9 = C.cell_of(10.0, 10.0, 9)
    assert c8 // C.RES_BASE == 8 and c9 // C.RES_BASE == 9


def test_ring_cells_counts_and_wrap():
    cell = int(C.cell_of(0.0, 179.9, 4))
    ring1 = C.ring_cells(cell, 4, 1)
    assert len(ring1) == 9 and cell in ring1
    # wraps the antimeridian: some cells on the far west side
    iy, ix = C.cell_decompose(ring1, 4)
    assert 0 in ix  # wrapped around
    # pole clamp: fewer unique rows at the top
    top = int(C.cell_of(89.9, 0.0, 4))
    assert len(C.ring_cells(top, 4, 1)) == 6  # 2 rows x 3 cols


def test_cover_bbox():
    cover = C.cover_bbox(10.0, 12.0, 20.0, 23.0, 6)
    n = 1 << 6
    lat0 = np.floor((10.0 + 90) / 180 * n)
    lat1 = np.floor((12.0 + 90) / 180 * n)
    lon0 = np.floor((20.0 + 180) / 360 * n)
    lon1 = np.floor((23.0 + 180) / 360 * n)
    assert len(cover) == (lat1 - lat0 + 1) * (lon1 - lon0 + 1)


def test_mercator_tile_known_values():
    # well-known slippy goldens (OSM floor convention): (0,0) z1 -> (1,1)
    tx, ty = C.mercator_tile(0.0, 0.0, 1)
    assert (tx, ty) == (1, 1)
    tx, ty = C.mercator_tile(40.7128, -74.0060, 10)
    assert (int(tx), int(ty)) == (301, 385)
    tx, ty = C.mercator_tile(51.5074, -0.1278, 12)
    assert (int(tx), int(ty)) == (2046, 1362)


def test_pip_square_with_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
    px = np.array([5.0, 1.0, 11.0, 5.0, -0.1])
    py = np.array([5.0, 1.0, 5.0, 9.0, 5.0])
    inside = G.pip_mask(px, py, [shell, hole])
    assert inside.tolist() == [False, True, False, True, False]


def test_pip_matches_scalar_oracle():
    rng = np.random.default_rng(3)
    ring = np.array(
        [[0, 0], [8, 2], [10, 8], [5, 11], [-1, 7], [0, 0]], dtype=float
    )
    px = rng.uniform(-2, 12, 500)
    py = rng.uniform(-2, 13, 500)

    def scalar_pip(x, y):
        inside = False
        for i in range(len(ring) - 1):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                inside = not inside
        return inside

    expect = np.array([scalar_pip(x, y) for x, y in zip(px, py)])
    assert np.array_equal(G.pip_mask(px, py, [ring]), expect)


def test_wire_struct_roundtrip():
    geoms = [
        {"type": "Point", "coordinates": [1.5, 2.5]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        {
            "type": "Polygon",
            "coordinates": [
                [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
                [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]],
            ],
        },
        {
            "type": "MultiPolygon",
            "coordinates": [
                [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 0.0]]],
                [[[5.0, 5.0], [7.0, 5.0], [7.0, 7.0], [5.0, 5.0]]],
            ],
        },
    ]
    for g in geoms:
        t, dim, lengths, coords = G.geojson_to_wire(g)
        assert G.wire_to_geojson(t, dim, lengths, coords) == g


def test_sql_formulas_match_numpy_via_duckdb():
    """The SQL-text builders must produce the numpy kernel's results when
    executed by DuckDB (the oracle engine)."""
    import duckdb

    rng = np.random.default_rng(11)
    lat = rng.uniform(-90, 90, 2000)
    lon = rng.uniform(-180, 180, 2000)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lat": lat, "lon": lon}))
    for res in (4, 9, 14):
        got = con.execute(
            f"SELECT {C.sql_cell('lat', 'lon', res)} AS c FROM pts"
        ).fetchnumpy()["c"]
        assert np.array_equal(got, C.cell_of(lat, lon, res))
    # parent formula
    child_expr = C.sql_cell("lat", "lon", 14)
    got = con.execute(
        f"SELECT {C.sql_cell_parent(child_expr, 14, 9)} AS p FROM pts"
    ).fetchnumpy()["p"]
    assert np.array_equal(got, C.cell_of(lat, lon, 9))
    # tiles
    for z in (4, 8):
        gx = con.execute(
            f"SELECT {C.sql_equirect_tile_x('lon', z)} AS x FROM pts"
        ).fetchnumpy()["x"]
        gy = con.execute(
            f"SELECT {C.sql_equirect_tile_y('lat', z)} AS y FROM pts"
        ).fetchnumpy()["y"]
        ex, ey = C.equirect_tile(lat, lon, z)
        assert np.array_equal(gx, ex) and np.array_equal(gy, ey)


def test_cover_polygon_subset_of_bbox_and_sufficient():
    # a thin diagonal polygon: exact cover should drop many bbox cells
    ring = np.array(
        [[0.0, 0.0], [10.0, 10.0], [10.5, 10.0], [0.5, 0.0], [0.0, 0.0]]
    )
    res = 8
    exact = set(C.cover_polygon([ring], res).tolist())
    bbox = set(C.cover_bbox(0.0, 10.0, 0.0, 10.5, res).tolist())
    assert exact <= bbox
    assert len(exact) < len(bbox) * 0.6  # thin shape -> real reduction
    # sufficiency: every random point inside the polygon maps to a kept cell
    rng = np.random.default_rng(2)
    px = rng.uniform(0, 10.5, 2000)
    py = rng.uniform(0, 10.0, 2000)
    inside = G.pip_mask(px, py, [ring])
    cells = C.cell_of(py[inside], px[inside], res)
    assert set(cells.tolist()) <= exact


def test_sql_ring_cells_matches_numpy(spark):
    """The JVM ring-disk array expression equals the numpy ring_cells
    kernel cell-for-cell, including pole clamping and lon wrap."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geobuf_cpp_spark.functions.cells import cell_of, ring_cells, sql_ring_cells

    pts = pd.DataFrame(
        {
            "lat": [0.0, 51.5, -89.9, 89.99, 12.3],
            "lon": [0.0, -0.1, 179.99, -179.99, 44.4],
        }
    )
    df = spark.createDataFrame(pts)
    for res, k in ((7, 2), (5, 1), (3, 3)):
        got = df.select(
            "lat", "lon",
            F.expr(sql_ring_cells("lat", "lon", res, k)).alias("cells"),
        ).collect()
        for r in got:
            expect = sorted(
                int(c) for c in ring_cells(int(cell_of(r["lat"], r["lon"], res)), res, k)
            )
            assert sorted(r["cells"]) == expect, (r["lat"], r["lon"], res, k)


def test_polygon_area_shoelace():
    import numpy as np

    from geobuf_cpp_spark.functions.geometry import polygon_area, ring_area_signed

    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    assert ring_area_signed(square) == 16.0          # CCW positive
    assert ring_area_signed(square[::-1]) == -16.0   # CW negative
    assert polygon_area([square]) == 16.0
    assert polygon_area([square, hole]) == 15.0      # hole subtracted
    assert polygon_area([]) == 0.0


def test_quadkey_and_ring_sql_fuzz(spark):
    """Random coordinates: the SQL builders must match the numpy kernels
    exactly (quadkeys and ring disks), including clamp/wrap edges."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geobuf_cpp_spark.functions.cells import (
        cell_of,
        quadkey_of,
        ring_cells,
        sql_quadkey,
        sql_ring_cells,
    )

    rng = np.random.default_rng(3)
    lat = np.concatenate([rng.uniform(-90, 90, 40), [90.0, -90.0, 0.0]])
    lon = np.concatenate([rng.uniform(-180, 180, 40), [180.0, -180.0, 0.0]])
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    res = 6
    rows = df.select(
        "lat", "lon",
        F.expr(sql_quadkey("lat", "lon", res)).alias("qk"),
        F.expr(sql_ring_cells("lat", "lon", res, 1)).alias("ring"),
    ).collect()
    for r in rows:
        assert r["qk"] == str(quadkey_of(np.array([r["lat"]]), np.array([r["lon"]]), res)[0])
        expect = sorted(int(c) for c in ring_cells(int(cell_of(r["lat"], r["lon"], res)), res, 1))
        assert sorted(r["ring"]) == expect


def test_geohash_matches_textbook_bisection():
    """The closed-form kernel equals an independent successive-bisection
    reference (the algorithm as published), including the canonical
    geohash.org example."""
    import numpy as np

    from geobuf_cpp_spark.functions.cells import GEOHASH_ALPHABET, geohash_of

    def reference(lat, lon, length):
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        bits, out, even = 0, [], True
        val = 0
        while len(out) < length:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    val = (val << 1) | 1; lon_lo = mid
                else:
                    val = val << 1; lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    val = (val << 1) | 1; lat_lo = mid
                else:
                    val = val << 1; lat_hi = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(GEOHASH_ALPHABET[val]); bits, val = 0, 0
        return "".join(out)

    assert reference(57.64911, 10.40744, 7) == "u4pruyd"  # geohash.org
    rng = np.random.default_rng(11)
    lats = rng.uniform(-89.9, 89.9, 200)
    lons = rng.uniform(-179.9, 179.9, 200)
    got = geohash_of(lats, lons, 6)
    for la, lo, g in zip(lats, lons, got):
        assert g == reference(la, lo, 6), (la, lo)


def test_hex_bin_matches_brute_force_voronoi(spark):
    """hex_bin = exact nearest triangular-lattice center: compare to a
    wide brute-force center search, incl. the x<14 odd-row zone where
    Spark div and floor division enumerate different candidate sets."""
    import pandas as pd

    from geobuf_cpp_spark.functions.cells import HEX_VY, HEX_W, hex_bin

    pts = [(i, (i * 131) % 500, (i * 257) % 400) for i in range(800)]
    pts += [(9000 + x, x, 49) for x in range(0, 30)]   # divergence zone
    df = spark.createDataFrame(pts, "point_id long, ix long, iy long")
    got = {r["point_id"]: (r["hr"], r["hc"], r["d2"])
           for r in hex_bin(df).collect()}

    def brute(x, y):
        best = None
        r0 = y // HEX_VY
        for r in range(max(r0 - 2, 0), r0 + 3):
            sx = (r % 2) * HEX_W  # doubled-space stagger: real shift = w/2
            c0 = (2 * x - sx) // (2 * HEX_W)
            for c in range(c0 - 2, c0 + 3):
                cx2, cy2 = 2 * c * HEX_W + sx, 2 * r * HEX_VY
                d2 = (2 * x - cx2) ** 2 + (2 * y - cy2) ** 2
                cand = (d2, r, c)
                if best is None or cand < best:
                    best = cand
        return best

    for pid, x, y in pts:
        d2, r, c = brute(x, y)
        assert got[pid] == (r, c, d2), (pid, x, y)
