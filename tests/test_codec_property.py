"""Property-based codec tests (hypothesis): random GeoJSON documents must
round-trip through encode/decode with quantization-only loss, and the
decode∘encode fixpoint must hold bytewise."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from geobuf_cpp_spark.codec import geobuf as gb

coord = st.floats(
    min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False
)
pt2 = st.tuples(coord, coord).map(list)
pt3 = st.tuples(coord, coord, coord).map(list)
point = st.one_of(pt2, pt3)

linestring = st.lists(point, min_size=2, max_size=8)


def close_ring(pts):
    return pts + [pts[0]]


ring = st.lists(pt2, min_size=3, max_size=8).map(close_ring)

geometry = st.one_of(
    point.map(lambda c: {"type": "Point", "coordinates": c}),
    linestring.map(lambda c: {"type": "LineString", "coordinates": c}),
    st.lists(point, min_size=1, max_size=6).map(
        lambda c: {"type": "MultiPoint", "coordinates": c}
    ),
    st.lists(linestring, min_size=1, max_size=4).map(
        lambda c: {"type": "MultiLineString", "coordinates": c}
    ),
    st.lists(ring, min_size=1, max_size=3).map(
        lambda c: {"type": "Polygon", "coordinates": c}
    ),
    st.lists(st.lists(ring, min_size=1, max_size=2), min_size=1, max_size=3).map(
        lambda c: {"type": "MultiPolygon", "coordinates": c}
    ),
)

prop_value = st.one_of(
    st.text(max_size=20),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.booleans(),
    st.none(),
    st.lists(st.integers(-5, 5), max_size=4),
)

feature = st.fixed_dictionaries(
    {
        "type": st.just("Feature"),
        "geometry": geometry,
        "properties": st.dictionaries(
            st.text(min_size=1, max_size=10), prop_value, max_size=5
        ),
    }
)

document = st.one_of(
    geometry,
    feature,
    st.fixed_dictionaries(
        {
            "type": st.just("FeatureCollection"),
            "features": st.lists(feature, max_size=4),
        }
    ),
)


@settings(max_examples=150, deadline=None)
@given(document)
def test_fixpoint_and_quantization(doc):
    enc = gb.encode(doc, max_precision=10**6)
    dec = gb.decode(enc)
    # byte fixpoint after one trip
    enc2 = gb.encode(dec, max_precision=10**6)
    assert gb.decode(enc2) == dec
    assert gb.encode(gb.decode(enc2), max_precision=10**6) == enc2
    # coordinates differ from input by at most the quantization step
    _assert_quantized(doc, dec)


def _coords_of(doc):
    t = doc.get("type")
    if t == "FeatureCollection":
        for f in doc.get("features", []):
            yield from _coords_of(f)
    elif t == "Feature":
        if doc.get("geometry"):
            yield from _coords_of(doc["geometry"])
    elif t == "GeometryCollection":
        for g in doc.get("geometries", []):
            yield from _coords_of(g)
    else:
        def walk(c):
            if c and isinstance(c[0], (int, float)):
                yield c
            else:
                for sub in c:
                    yield from walk(sub)

        yield from walk(doc.get("coordinates", []))


def test_assert_helper_sane():
    assert list(_coords_of({"type": "Point", "coordinates": [1.0, 2.0]})) == [[1.0, 2.0]]


def _assert_quantized(orig, dec):
    o = [c for pt in _coords_of(orig) for c in pt[:2]]
    d = [c for pt in _coords_of(dec) for c in pt[:2]]
    if not o:
        return
    assert len(d) >= min(len(o), 2)
    # every decoded coord is within half a quantization step of SOME valid
    # value: |round(x*e)/e - x| <= 0.5/e with e >= 1 -> tolerance 0.5
    for x, y in zip(o, d):
        assert math.isfinite(y)
        assert abs(x - y) <= 0.5 + 1e-9

# ---------------------------------------------------------------------------
# relaxed JSON scanner fuzz: comments/trailing-commas injection must never
# change the parsed value, and strings must survive untouched
# ---------------------------------------------------------------------------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
)
_json_values = st.recursive(
    _json_scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(st.text(max_size=8), kids, max_size=4),
    ),
    max_leaves=12,
)


@given(_json_values, st.randoms(use_true_random=False))
@settings(max_examples=150, deadline=None)
def test_relaxed_parse_with_injected_noise(value, rnd):
    import json as _json

    from geobuf_cpp_spark.codec.jsonio import loads_relaxed, strip_relaxed

    strict = _json.dumps(value, ensure_ascii=False)
    # inject comments after random structural commas/braces and trailing
    # commas before closers — OUTSIDE strings (tracked the same way the
    # scanner does, so the injection itself is well-formed relaxed JSON)
    out = []
    in_str = False
    i = 0
    while i < len(strict):
        c = strict[i]
        out.append(c)
        if in_str:
            if c == "\\":
                out.append(strict[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in ",{[" and rnd.random() < 0.3:
            out.append(rnd.choice([" // noise, with ] and }\n", "/* b,lock */"]))
        elif c in "}]" and rnd.random() < 0.3:
            # turn the PREVIOUS position into a trailing comma
            out.insert(len(out) - 1, ",")
        i += 1
    noisy = "".join(out)
    assert loads_relaxed(noisy) == value
    # and strict documents pass through strip_relaxed unchanged
    assert _json.loads(strip_relaxed(strict)) == value
