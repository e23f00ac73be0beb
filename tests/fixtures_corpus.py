"""Codec fixture corpus — replicates the fixture *categories* of the
reference test suite (reference tests/test_geobuf.cpp:12-19: issue55 /
issue62 / issue90 / precision / props / single-multipoly; data/sample1.json;
the embedded pytest feature of tests/test_geobuf.py:26-47).

All documents are deterministic literals. ``LOSSLESS`` fixtures have
coordinates exact at precision 6 so input == round-trip after normalization
(the md5 methodology of geobuf-roundtrip-test.py:165-172); ``LOSSY`` ones
exercise the precision cap and are only checked for the decode∘encode
fixpoint (tests/test_geobuf.py:360-364).
"""

# data/sample1.json replica: FC-level custom props, feature custom props,
# null geometry, mixed geometry types.
SAMPLE1 = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[120.403175, 31.416966], [120.284519, 31.305783]],
            },
            "properties": {"name": "line-a", "length_km": 17.25},
            "my_num": 42,
            "my_list": [1, 2, 3],
            "my_map": {"k": "v"},
        },
        {
            "type": "Feature",
            "geometry": None,
            "properties": {"note": "null geometry"},
        },
        {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [0.0001, -0.0001]},
            "properties": {},
        },
        {
            "type": "Feature",
            "geometry": {
                "type": "MultiLineString",
                "coordinates": [
                    [[0.0, 0.0], [1.0, 1.0]],
                    [[2.0, 2.0], [3.0, 3.0], [4.0, 4.0]],
                ],
            },
            "properties": {"parts": 2},
        },
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
                    [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],
                ],
            },
            "properties": {"rings": 2},
        },
    ],
    "key": "value",
    "shit me": 42,
}

# tests/test_geobuf.py:26-47 replica: 3D LineString, mixed-type props,
# geometry + feature custom props. Coordinates exact at precision 6.
LINESTRING3D_PROPS = {
    "type": "Feature",
    "properties": {
        "string": "string",
        "int": 42,
        "double": 3.141593,
        "list": ["a", "list", "is", "a", "list"],
    },
    "geometry": {
        "type": "LineString",
        "coordinates": [
            [120.403175, 31.416966, 1.111111],
            [120.284519, 31.305783, 2.22],
            [120.355922, 31.217819, 3.333333],
            [120.670938, 31.299502, 4.4],
        ],
        "extra_key": "extra_value",
    },
    "my_key": "my_value",
}

# precision ladder incl. the tie value from tests/test_geobuf.cpp:61-83.
PRECISION = {
    "type": "Feature",
    "properties": {},
    "geometry": {
        "type": "MultiPoint",
        "coordinates": [
            [1.0, 2.0],
            [1.5, -2.5],
            [1.25, 2.125],
            [119.88281249999999, 31.2],
            [0.123456789, -0.000000001],
        ],
    },
}

# every value kind (geobuf.cpp:462-470): string, double, uint64 big,
# negative int64, bool, nested array/object, null, bytes handled separately.
PROPS = {
    "type": "Feature",
    "properties": {
        "s": "hello 世界",
        "d": 2.5,
        "u": 9223372036854775807,
        "i": -42,
        "b_true": True,
        "b_false": False,
        "arr": [1, "two", 3.0, None],
        "obj": {"nested": {"deep": [1, 2]}},
        "nul": None,
    },
    "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
}

# lengths-omission cases (geobuf.cpp:507-519, 777-805)
SINGLE_MULTIPOLY = {
    "type": "Feature",
    "properties": {"case": "1 poly x 1 ring -> no lengths"},
    "geometry": {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 0.0]]],
        ],
    },
}

MULTI_MULTIPOLY = {
    "type": "Feature",
    "properties": {"case": "2 polys, one with hole -> full lengths"},
    "geometry": {
        "type": "MultiPolygon",
        "coordinates": [
            [
                [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
                [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]],
            ],
            [[[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 10.0]]],
        ],
    },
}

GEOMETRY_ONLY = {
    "type": "LineString",
    "coordinates": [[0.5, 0.5], [1.5, 1.5], [2.5, -2.5]],
}

FEATURE_IDS = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "id": 1234567890123,
            "geometry": {"type": "Point", "coordinates": [1.0, 1.0]},
            "properties": {"id_kind": "int64"},
        },
        {
            "type": "Feature",
            "id": -77,
            "geometry": {"type": "Point", "coordinates": [2.0, 2.0]},
            "properties": {"id_kind": "negative int64"},
        },
        {
            "type": "Feature",
            "id": "str-id",
            "geometry": {"type": "Point", "coordinates": [3.0, 3.0]},
            "properties": {"id_kind": "string"},
        },
    ],
}

GEOMETRYCOLLECTION = {
    "type": "Feature",
    "properties": {"gc": True},
    "geometry": {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [1.5, 2.5]},
            {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
            {
                "type": "GeometryCollection",
                "geometries": [{"type": "Point", "coordinates": [9.0, 9.0]}],
            },
        ],
    },
}

EMPTY_CASES = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "geometry": None, "properties": {}},
    ],
}

# 3D with z everywhere nonzero -> dim header written (geobuf.cpp:232-234)
POLYGON_3D = {
    "type": "Feature",
    "properties": {},
    "geometry": {
        "type": "Polygon",
        "coordinates": [
            [
                [0.0, 0.0, 1.0],
                [4.0, 0.0, 2.0],
                [4.0, 4.0, 3.0],
                [0.0, 0.0, 1.0],
            ]
        ],
    },
}

# Lossless at precision 6 (round-trip == input after normalization)
LOSSLESS = {
    "sample1": SAMPLE1,
    "linestring3d_props": LINESTRING3D_PROPS,
    "props": PROPS,
    "single_multipoly": SINGLE_MULTIPOLY,
    "multi_multipoly": MULTI_MULTIPOLY,
    "geometry_only": GEOMETRY_ONLY,
    "feature_ids": FEATURE_IDS,
    "geometrycollection": GEOMETRYCOLLECTION,
    "empty_cases": EMPTY_CASES,
    "polygon_3d": POLYGON_3D,
}

# Exercise the precision cap; only decode∘encode fixpoint is asserted
# (like geobuf-roundtrip-test.py:193-196 excluding precision.json).
LOSSY = {
    "precision": PRECISION,
}

ALL = {**LOSSLESS, **LOSSY}
