"""Parity against the reference's own shipped fixture (data/sample1.json).

Mirrors the semantic assertions of reference tests/test_geobuf.cpp:85-131
(custom-property counts) and the round-trip methodology of its Makefile
smoke + geobuf-roundtrip-test.py. Reads the fixture from the read-only
reference checkout; skipped when unavailable (the repo stays standalone).
"""

import json
import math
import os

import pytest

from geobuf_cpp_spark.codec import geobuf as gb

REF_SAMPLE = "/root/reference/data/sample1.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SAMPLE), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def sample():
    with open(REF_SAMPLE) as f:
        return json.load(f)


def test_custom_property_counts(sample):
    # tests/test_geobuf.cpp:119-130: fc has 2 custom props, feature 0 has 3
    fc_custom = {k: v for k, v in sample.items() if k not in ("type", "features")}
    assert len(fc_custom) == 2 and fc_custom["shit me"] == 42
    f0 = sample["features"][0]
    f0_custom = {
        k: v for k, v in f0.items()
        if k not in ("type", "geometry", "properties", "id")
    }
    assert len(f0_custom) == 3

    decoded = gb.decode(gb.encode(sample, max_precision=10**8))
    dec_fc_custom = {
        k: v for k, v in decoded.items() if k not in ("type", "features")
    }
    assert dec_fc_custom == fc_custom
    d0 = decoded["features"][0]
    dec_f0_custom = {
        k: v for k, v in d0.items()
        if k not in ("type", "geometry", "properties", "id")
    }
    assert dec_f0_custom == f0_custom


def test_roundtrip_structure_and_precision(sample):
    decoded = gb.decode(gb.encode(sample, max_precision=10**8))
    assert len(decoded["features"]) == len(sample["features"])
    for orig, dec in zip(sample["features"], decoded["features"]):
        og, dg = orig["geometry"], dec["geometry"]
        if og is None:
            assert dg is None
            continue
        assert dg["type"] == og["type"]
    # null geometry preserved (feature 1)
    assert decoded["features"][1]["geometry"] is None
    # properties round-trip exactly (doubles are raw tag-2, never quantized)
    assert decoded["features"][1]["properties"] == {"  profit": -999.9}
    assert decoded["features"][5]["properties"] == {"key": {"nested": "key"}}


def _flat_coords(geom):
    def walk(c):
        if c and isinstance(c[0], (int, float)):
            yield c
        else:
            for s in c:
                yield from walk(s)

    yield from walk(geom.get("coordinates", []))


def test_coords_quantized_at_cap(sample):
    decoded = gb.decode(gb.encode(sample, max_precision=10**8))
    # dim promoted to 3 by the mixed MultiLineString (geobuf.cpp:346-348)
    for orig, dec in zip(sample["features"], decoded["features"]):
        if orig["geometry"] is None:
            continue
        o = [c for pt in _flat_coords(orig["geometry"]) for c in pt]
        d = [c for pt in _flat_coords(dec["geometry"]) for c in pt]
        assert len(o) == len(d)
        for x, y in zip(o, d):
            assert math.isclose(x, y, abs_tol=0.5e-8 + 1e-12), (x, y)


def test_fixpoint_after_one_trip(sample):
    enc1 = gb.encode(sample, max_precision=10**8)
    dec1 = gb.decode(enc1)
    enc2 = gb.encode(dec1, max_precision=10**8)
    assert gb.decode(enc2) == dec1
    assert enc2 == gb.encode(gb.decode(enc2), max_precision=10**8)
