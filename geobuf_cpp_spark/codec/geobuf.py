"""Pure-Python + numpy Geobuf codec (GeoJSON dict <-> PBF bytes).

Re-implements, from public knowledge of the wire format, the codec semantics
of the reference encoder/decoder (district10/geobuf-cpp,
``src/geobuf/geobuf.cpp``), to be wrapped by Arrow-batched pandas UDFs:

* Data header: repeated ``keys`` (tag 1, first-seen order —
  geobuf.cpp:217-231, 359-372), ``dim`` (tag 2, omitted when == 2 —
  geobuf.cpp:232-234), ``precision`` = log10(e) (tag 3, omitted when == 6 —
  geobuf.cpp:235-239), then FeatureCollection/Feature/Geometry under
  tag 4/5/6 (geobuf.cpp:241-253).
* dim auto-detect: any nonzero z promotes the document to dim=3
  (geobuf.cpp:346-348).
* precision auto-detect: e grows x10 while ``round(coord*e)/e != coord``,
  capped at ``max_precision`` (geobuf.cpp:349-357). Rounding is C++
  ``std::round`` = half-away-from-zero, NOT banker's rounding
  (geobuf.cpp:479; divergence documented in reference
  tests/test_geobuf.cpp:61-83).
* Coordinates: quantize -> per-ring delta -> zigzag -> packed varint
  (geobuf.cpp:473-552). The delta running sum RESETS per ring/line (local
  ``sum`` in populateLine, geobuf.cpp:537-552; decode mirror
  ``populate_points`` geobuf.cpp:681-700).
* Ring closing: closed shapes drop the last point on encode
  (``size()-1``, geobuf.cpp:497,516,542) and re-close on decode
  (geobuf.cpp:696-698).
* Lengths omission: MultiLineString/Polygon omit tag-2 lengths for a single
  part (geobuf.cpp:492-500); MultiPolygon omits for 1 polygon x 1 ring, else
  writes ``[n_polys, (n_rings, ring_size...)...]`` (geobuf.cpp:509-519).
* Values: string tag1 / double tag2 / uint64 tag3 (int >= 0) / int64 tag4
  encoded as ``uint64(-v)`` (!) / bool tag5 / nested JSON as string tag6
  (geobuf.cpp:462-470, decode :860-882). Python ints split by sign like the
  reference binding (src/geobuf/pybind11_helpers.hpp:352-358); ``bytes``
  become base64 strings (pybind11_helpers.hpp:68-75).
* ``custom_properties``: extra JSON members on geometry / feature / feature
  collection, wire tag 15 (geobuf.cpp:381-383, 402-404, 443-445).

Two deliberate, documented deviations from the reference implementation:

1. **Value-index scoping.** The reference restarts ``valueIndex`` at 0 for
   every ``writeProps`` call (geobuf.cpp:451-458) while its decoder
   accumulates all tag-13 values of the parent message into one list
   (geobuf.cpp:643-673) — so a feature carrying BOTH properties and
   custom_properties decodes its custom values against the wrong slots
   (visible as the disabled ``expected == actually`` assertion in reference
   tests/test_geobuf.py:385). This codec continues the value index across
   the property groups of one parent message, making round-trips lossless;
   documents with only one property group (all standard GeoJSON fixtures)
   are byte-compatible with the reference encoder's layout.
2. **Feature ids.** Int ids in the int64 range are written as tag 12 int64
   (geobuf.cpp:393); ints OUTSIDE int64 (uint64 upper half / bigints) take
   the reference's generic branch and are JSON-dumped into the tag-11
   string id (geobuf.cpp:395-397) — they decode back as numeric strings,
   exactly like the reference decoder. Strings go to tag 11; any other id
   type is JSON-dumped into tag 11.
"""

from __future__ import annotations

import base64
import json
import math
from typing import Any

import numpy as np

from .jsonio import loads_relaxed
from .pbf import PbfReader, PbfWriter

DEFAULT_DIM = 2
DEFAULT_PRECISION = 6

GEOM_TYPES = (
    "Point",
    "MultiPoint",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
    "GeometryCollection",
)
GEOM_TYPE_CODE = {name: i for i, name in enumerate(GEOM_TYPES)}

_GEOMETRY_STD_KEYS = {"type", "coordinates", "geometries"}
_FEATURE_STD_KEYS = {"type", "geometry", "properties", "id"}
_FC_STD_KEYS = {"type", "features"}


def round_half_away(x: float, e: float) -> int:
    """C++ std::round semantics: halfway cases away from zero (geobuf.cpp:479)."""
    v = x * e
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def _quantize(arr: np.ndarray, e: float) -> np.ndarray:
    """Vectorized half-away-from-zero quantization to int64."""
    v = arr * e
    return np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)


def json_dumps_canonical(obj: Any) -> str:
    """Compact JSON like RapidJSON's Writer (no spaces, raw UTF-8)."""
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class Encoder:
    """One instance per document; not thread safe (mirrors reference Encoder)."""

    def __init__(self, max_precision: int = 10**DEFAULT_PRECISION) -> None:
        self.max_precision = float(max_precision)
        self.dim = DEFAULT_DIM
        self.e = 1.0
        self.keys: dict[str, int] = {}

    # -- analyze pass (geobuf.cpp:285-358) --------------------------------

    def _analyze_point(self, pt) -> None:
        z = pt[2] if len(pt) > 2 else 0.0
        if z != 0:
            self.dim = 3
        if self.e >= self.max_precision:
            return
        for i in range(self.dim if len(pt) >= self.dim else len(pt)):
            c = pt[i]
            while (
                round_half_away(c, self.e) / self.e != c
                and self.e < self.max_precision
            ):
                self.e *= 10

    def _analyze_matrix(self, arr: np.ndarray) -> None:
        """Vectorized analyze over an (n, k) coordinate matrix.

        Result is identical to the reference per-point loop
        (geobuf.cpp:346-358): the final ``e`` is the max over coordinates of
        the minimal fitting power of ten (monotone growth, order-free), and
        dim=3 iff any z != 0; only coordinates within the *final* dim feed
        the precision loop, which the two-pass order below preserves.
        """
        if arr.shape[1] > 2 and np.any(arr[:, 2] != 0):
            self.dim = 3
        cols = min(arr.shape[1], self.dim)
        flat = arr[:, :cols].ravel()
        while self.e < self.max_precision:
            v = flat * self.e
            ok = np.copysign(np.floor(np.abs(v) + 0.5), v) / self.e == flat
            if ok.all():
                break
            flat = flat[~ok]
            self.e *= 10

    def _analyze_coords(self, coords, depth: int) -> None:
        if depth == 0:
            self._analyze_point(coords)
        elif depth == 1 and coords:
            k = len(coords[0])
            if len(coords) >= 24 and all(len(pt) == k for pt in coords):
                # homogeneous 2D/3D point list, big enough to amortize the
                # numpy kernel setup -> vectorized
                self._analyze_matrix(np.asarray(coords, dtype=np.float64))
            else:  # small or ragged: per-point scalar loop is faster
                for pt in coords:
                    self._analyze_point(pt)
        else:
            for sub in coords:
                self._analyze_coords(sub, depth - 1)

    def _save_key(self, key: str) -> None:
        if key not in self.keys:
            self.keys[key] = len(self.keys)

    def _save_keys(self, props: dict | None) -> None:
        if props:
            for k in props:
                self._save_key(k)

    def _analyze_geometry(self, geom: dict | None) -> None:
        if not geom:
            return
        t = geom.get("type")
        if t == "GeometryCollection":
            for sub in geom.get("geometries", ()):
                self._analyze_geometry(sub)
        elif t in GEOM_TYPE_CODE:
            depth = {
                "Point": 0,
                "MultiPoint": 1,
                "LineString": 1,
                "MultiLineString": 2,
                "Polygon": 2,
                "MultiPolygon": 3,
            }[t]
            self._analyze_coords(geom.get("coordinates", ()), depth)
        self._save_keys(_custom_props(geom, _GEOMETRY_STD_KEYS))

    def _analyze_feature(self, f: dict) -> None:
        self._save_keys(f.get("properties"))
        self._save_keys(_custom_props(f, _FEATURE_STD_KEYS))
        self._analyze_geometry(f.get("geometry"))

    # -- write pass (geobuf.cpp:210-552) -----------------------------------

    def encode(self, obj: dict) -> bytes:
        self.dim = DEFAULT_DIM
        self.e = 1.0
        self.keys = {}

        t = obj.get("type")
        if t == "FeatureCollection":
            for f in obj.get("features", ()):
                self._analyze_feature(f)
            self._save_keys(_custom_props(obj, _FC_STD_KEYS))
        elif t == "Feature":
            self._analyze_feature(obj)
        else:
            self._analyze_geometry(obj)

        pbf = PbfWriter()
        for key in self.keys:  # insertion order == index order
            pbf.add_string(1, key)
        if self.dim != DEFAULT_DIM:
            pbf.add_uint32(2, self.dim)
        precision = int(round(math.log10(min(self.e, self.max_precision))))
        if precision != DEFAULT_PRECISION:
            pbf.add_uint32(3, precision)

        if t == "FeatureCollection":
            sub = PbfWriter()
            self._write_fc(obj, sub)
            pbf.add_message(4, sub)
        elif t == "Feature":
            sub = PbfWriter()
            self._write_feature(obj, sub)
            pbf.add_message(5, sub)
        else:
            sub = PbfWriter()
            self._write_geometry(obj, sub)
            pbf.add_message(6, sub)
        return pbf.tobytes()

    def _write_fc(self, fc: dict, pbf: PbfWriter) -> None:
        for f in fc.get("features", ()):
            sub = PbfWriter()
            self._write_feature(f, sub)
            pbf.add_message(1, sub)
        custom = _custom_props(fc, _FC_STD_KEYS)
        if custom:
            self._write_props(custom, pbf, 15, 0)

    def _write_feature(self, f: dict, pbf: PbfWriter) -> None:
        geom = f.get("geometry")
        if geom:
            sub = PbfWriter()
            self._write_geometry(geom, sub)
            pbf.add_message(1, sub)
        fid = f.get("id")
        if fid is not None:
            if isinstance(fid, bool) or not isinstance(fid, (int, str)):
                pbf.add_string(11, json_dumps_canonical(fid))
            elif isinstance(fid, int):
                if -(1 << 63) <= fid < (1 << 63):
                    pbf.add_int64(12, fid)
                else:
                    # reference geobuf.cpp:392-397: an id outside int64
                    # (the uint64 upper half, or a Python bigint) is not
                    # the int64 alternative — it takes the generic branch
                    # and is JSON-dumped into the tag-11 string id
                    pbf.add_string(11, json_dumps_canonical(fid))
            else:
                pbf.add_string(11, fid)
        n = 0
        props = f.get("properties")
        if props:
            n = self._write_props(props, pbf, 14, 0)
        custom = _custom_props(f, _FEATURE_STD_KEYS)
        if custom:
            self._write_props(custom, pbf, 15, n)

    def _write_geometry(self, geom: dict, pbf: PbfWriter) -> None:
        t = geom.get("type")
        coords = geom.get("coordinates")
        if t == "Point":
            pbf.add_enum(1, 0)
            # scalar path: Points dominate web corpora and numpy setup
            # costs more than the 2-3 values themselves
            q = [round_half_away(coords[i] if i < len(coords) else 0.0, self.e)
                 for i in range(self.dim)]
            from .pbf import pack_sint64_array

            pbf.add_bytes(3, pack_sint64_array(np.asarray(q, dtype=np.int64)))
        elif t == "MultiPoint":
            pbf.add_enum(1, 1)
            pbf.add_bytes(3, self._pack_line(coords, closed=False))
        elif t == "LineString":
            pbf.add_enum(1, 2)
            pbf.add_bytes(3, self._pack_line(coords, closed=False))
        elif t == "MultiLineString":
            pbf.add_enum(1, 3)
            self._write_multiline(coords, pbf, closed=False)
        elif t == "Polygon":
            pbf.add_enum(1, 4)
            self._write_multiline(coords, pbf, closed=True)
        elif t == "MultiPolygon":
            pbf.add_enum(1, 5)
            self._write_multipolygon(coords, pbf)
        elif t == "GeometryCollection":
            pbf.add_enum(1, 6)
            for sub_geom in geom.get("geometries", ()):
                sub = PbfWriter()
                self._write_geometry(sub_geom, sub)
                pbf.add_message(4, sub)
        custom = _custom_props(geom, _GEOMETRY_STD_KEYS)
        if custom:
            self._write_props(custom, pbf, 15, 0)

    def _deltas(self, line, closed: bool) -> np.ndarray:
        """Quantize + per-ring delta (running sum resets here, geobuf.cpp:537-552)."""
        if 0 < len(line) <= 16:  # scalar path for short rings (see pbf.py note)
            n = len(line) - (1 if closed else 0)
            out = np.empty(n * self.dim, dtype=np.int64)
            prev = [0] * self.dim
            at = 0
            for i in range(n):
                pt = line[i]
                for j in range(self.dim):
                    q = round_half_away(pt[j] if j < len(pt) else 0.0, self.e)
                    out[at] = q - prev[j]
                    prev[j] = q
                    at += 1
            return out
        k0 = len(line[0]) if line else 0
        if line and not all(len(pt) == k0 for pt in line):
            # ragged mixed 2/3-coord points: missing z defaults to 0
            # (reference stores every point as xyz in memory)
            mat = np.zeros((len(line), 3), dtype=np.float64)
            for i, pt in enumerate(line):
                mat[i, : len(pt)] = pt[:3]
        else:
            mat = np.asarray(line, dtype=np.float64).reshape(len(line), -1)
        arr = _pad(mat, self.dim)
        if closed:
            arr = arr[:-1]
        q = _quantize(arr, self.e)
        out = q.copy()
        out[1:] -= q[:-1]
        return out.ravel()

    def _pack_line(self, line, closed: bool) -> bytes:
        from .pbf import pack_sint64_array

        return pack_sint64_array(self._deltas(line, closed))

    def _write_multiline(self, lines, pbf: PbfWriter, closed: bool) -> None:
        drop = 1 if closed else 0
        if len(lines) != 1:
            pbf.add_packed_uint32(2, [len(line) - drop for line in lines])
        parts = [self._deltas(line, closed) for line in lines]
        pbf.add_packed_sint64(3, np.concatenate(parts) if parts else np.empty(0, np.int64))

    def _write_multipolygon(self, polygons, pbf: PbfWriter) -> None:
        if len(polygons) != 1 or len(polygons[0]) != 1:
            lengths: list[int] = [len(polygons)]
            for poly in polygons:
                lengths.append(len(poly))
                lengths.extend(len(ring) - 1 for ring in poly)
            pbf.add_packed_uint32(2, lengths)
        parts = [self._deltas(ring, True) for poly in polygons for ring in poly]
        pbf.add_packed_sint64(3, np.concatenate(parts) if parts else np.empty(0, np.int64))

    def _write_props(self, props: dict, pbf: PbfWriter, tag: int, value_offset: int) -> int:
        """Write tag-13 values + packed [key_idx, val_idx] pairs.

        Returns the number of values written so a second group in the same
        parent message can continue the value index (deviation #1 above).
        """
        indexes: list[int] = []
        value_index = value_offset
        for key, value in props.items():
            sub = PbfWriter()
            _write_value(value, sub)
            pbf.add_message(13, sub)
            indexes.append(self.keys[key])
            indexes.append(value_index)
            value_index += 1
        pbf.add_packed_uint32(tag, indexes)
        return value_index - value_offset


def _pad(arr: np.ndarray, dim: int) -> np.ndarray:
    """Pad/truncate an (n, k) coord matrix to the document dim (z=0 default)."""
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    k = arr.shape[1]
    if k == dim:
        return arr
    if k > dim:
        return arr[:, :dim]
    out = np.zeros((arr.shape[0], dim), dtype=np.float64)
    out[:, :k] = arr
    return out


def _custom_props(obj: dict, std_keys: set) -> dict:
    return {k: v for k, v in obj.items() if k not in std_keys}


def _write_value(value: Any, pbf: PbfWriter) -> None:
    """6-way value variant (geobuf.cpp:462-470; int sign split per
    pybind11_helpers.hpp:352-358; bytes -> base64 per :68-75)."""
    if isinstance(value, bool):
        pbf.add_bool(5, value)
    elif isinstance(value, int):
        if value >= 0:
            pbf.add_uint64(3, value)
        else:
            pbf.add_uint64(4, -value)
    elif isinstance(value, float):
        pbf.add_double(2, value)
    elif isinstance(value, str):
        pbf.add_string(1, value)
    elif isinstance(value, bytes):
        pbf.add_string(1, base64.b64encode(value).decode("ascii"))
    else:  # None / list / dict -> JSON string under tag 6
        pbf.add_string(6, json_dumps_canonical(value))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class Decoder:
    """PBF bytes -> GeoJSON dict (mirrors reference Decoder, geobuf.cpp:561-882)."""

    def __init__(self) -> None:
        self.dim = DEFAULT_DIM
        self.e = 10.0**DEFAULT_PRECISION
        self.keys: list[str] = []
        self.precision = DEFAULT_PRECISION

    def decode(self, data: bytes) -> dict:
        import struct

        try:
            return self._decode(data)
        except (IndexError, ValueError, UnicodeDecodeError, KeyError,
                struct.error) as ex:
            raise ValueError(f"malformed geobuf ({len(data)} bytes): {ex}") from ex

    def _decode(self, data: bytes) -> dict:
        self.dim = DEFAULT_DIM
        self.e = 10.0**DEFAULT_PRECISION
        self.precision = DEFAULT_PRECISION
        self.keys = []
        pbf = PbfReader(data)
        while pbf.next():
            if pbf.tag == 1:
                self.keys.append(pbf.get_string())
            elif pbf.tag == 2:
                self.dim = pbf.get_uint32()
            elif pbf.tag == 3:
                self.precision = pbf.get_uint32()
                self.e = 10.0**self.precision
            elif pbf.tag == 4:
                return self._read_fc(PbfReader(pbf.get_bytes()))
            elif pbf.tag == 5:
                return self._read_feature(PbfReader(pbf.get_bytes()))
            elif pbf.tag == 6:
                return self._read_geometry(PbfReader(pbf.get_bytes()))
            else:
                pbf.skip()
        return {}

    def _unpack_props(self, target: dict, indexes: np.ndarray, values: list) -> None:
        it = iter(indexes.tolist())
        for key_idx in it:
            val_idx = next(it)
            target[self.keys[key_idx]] = values[val_idx]

    def _read_fc(self, pbf: PbfReader) -> dict:
        fc: dict = {"type": "FeatureCollection", "features": []}
        values: list = []
        while pbf.next():
            if pbf.tag == 1:
                fc["features"].append(self._read_feature(PbfReader(pbf.get_bytes())))
            elif pbf.tag == 13:
                values.append(_read_value(PbfReader(pbf.get_bytes())))
            elif pbf.tag == 15:
                idx = pbf.get_packed_uint32()
                if idx.size % 2 == 0:
                    self._unpack_props(fc, idx, values)
            else:
                pbf.skip()
        return fc

    def _read_feature(self, pbf: PbfReader) -> dict:
        f: dict = {"type": "Feature", "geometry": None, "properties": {}}
        values: list = []
        while pbf.next():
            if pbf.tag == 1:
                f["geometry"] = self._read_geometry(PbfReader(pbf.get_bytes()))
            elif pbf.tag == 11:
                f["id"] = pbf.get_string()
            elif pbf.tag == 12:
                f["id"] = pbf.get_int64()
            elif pbf.tag == 13:
                values.append(_read_value(PbfReader(pbf.get_bytes())))
            elif pbf.tag == 14:
                idx = pbf.get_packed_uint32()
                if idx.size % 2 == 0:
                    self._unpack_props(f["properties"], idx, values)
            elif pbf.tag == 15:
                idx = pbf.get_packed_uint32()
                if idx.size % 2 == 0:
                    self._unpack_props(f, idx, values)
            else:
                pbf.skip()
        return f

    def _points(self, deltas: np.ndarray, closed: bool = False):
        """cumsum deltas / e, re-close (populate_points, geobuf.cpp:681-700)."""
        n = deltas.size // self.dim
        mat = deltas[: n * self.dim].reshape(n, self.dim).cumsum(axis=0) / self.e
        pts = mat.tolist()
        if closed and pts:
            pts.append(pts[0])
        return [_strip_z(p) for p in pts]

    def _read_geometry(self, pbf: PbfReader) -> dict | None:
        if not pbf.next():
            return None
        gtype = pbf.get_enum()
        lengths: np.ndarray | None = None
        values: list = []
        geom: dict = {"type": GEOM_TYPES[gtype] if gtype < 7 else "Point"}
        custom: dict = {}
        if gtype == 6:
            geom["geometries"] = []
        while pbf.next():
            if pbf.tag == 2:
                lengths = pbf.get_packed_uint32().astype(np.int64)
            elif pbf.tag == 3:
                deltas = pbf.get_packed_sint64()
                self._populate(geom, gtype, lengths, deltas)
            elif pbf.tag == 4:
                geom.setdefault("geometries", []).append(
                    self._read_geometry(PbfReader(pbf.get_bytes()))
                )
            elif pbf.tag == 13:
                values.append(_read_value(PbfReader(pbf.get_bytes())))
            elif pbf.tag == 15:
                idx = pbf.get_packed_uint32()
                if idx.size % 2 == 0:
                    self._unpack_props(custom, idx, values)
            else:
                pbf.skip()
        geom.update(custom)
        return geom

    def _populate(self, geom: dict, gtype: int, lengths, deltas: np.ndarray) -> None:
        if gtype == 0:  # Point
            pt = (deltas.astype(np.float64) / self.e).tolist()[: self.dim]
            geom["coordinates"] = _strip_z(pt)
        elif gtype in (1, 2):  # MultiPoint / LineString
            geom["coordinates"] = self._points(deltas)
        elif gtype in (3, 4):  # MultiLineString / Polygon
            closed = gtype == 4
            if lengths is None or lengths.size == 0:
                rings = [self._points(deltas, closed)]
            else:
                rings = []
                last = 0
                for ln in lengths.tolist():
                    rings.append(self._points(deltas[last * self.dim : (last + ln) * self.dim], closed))
                    last += ln
            geom["coordinates"] = rings
        elif gtype == 5:  # MultiPolygon (layout geobuf.cpp:777-805)
            if lengths is None or lengths.size == 0:
                geom["coordinates"] = [[self._points(deltas, True)]]
            else:
                ls = lengths.tolist()
                polys = []
                j = 1
                last = 0
                for _ in range(ls[0]):
                    n_rings = ls[j]
                    j += 1
                    poly = []
                    for _ in range(n_rings):
                        n_pts = ls[j]
                        j += 1
                        poly.append(self._points(deltas[last * self.dim : (last + n_pts) * self.dim], True))
                        last += n_pts
                    polys.append(poly)
                geom["coordinates"] = polys


def _strip_z(pt: list) -> list:
    """mapbox geojson-cpp emits the 3rd coordinate only when z != 0."""
    if len(pt) > 2 and pt[2] == 0:
        return pt[:2]
    return pt


def _read_value(pbf: PbfReader):
    if not pbf.next():
        return None
    if pbf.tag == 1:
        return pbf.get_string()
    if pbf.tag == 2:
        return pbf.get_double()
    if pbf.tag == 3:
        return pbf.get_uint64()
    if pbf.tag == 4:
        return -pbf.get_uint64()
    if pbf.tag == 5:
        return pbf.get_bool()
    if pbf.tag == 6:
        return json.loads(pbf.get_string())
    pbf.skip()
    return None


# ---------------------------------------------------------------------------
# module-level conveniences (mirror reference module fns, src/main.cpp:33-84)
# ---------------------------------------------------------------------------


def encode(obj: dict | str, max_precision: int = 10**8) -> bytes:
    if isinstance(obj, str):
        obj = loads_relaxed(obj)
    return Encoder(max_precision=max_precision).encode(obj)


def decode(data: bytes) -> dict:
    return Decoder().decode(data)


def normalize_json(obj: dict | str, sort_keys: bool = True, indent: int | None = 4) -> str:
    """Canonical JSON text for golden comparison (geobuf-roundtrip-test.py:55-63)."""
    if isinstance(obj, str):
        obj = loads_relaxed(obj)
    return json.dumps(obj, sort_keys=sort_keys, indent=indent, ensure_ascii=False)


def normalize_geobuf(data: bytes, max_precision: int = 10**8) -> bytes:
    """decode -> re-encode (pybind11_geobuf/__main__.py:54-80)."""
    return encode(decode(data), max_precision=max_precision)


def str2json2str(text: str, indent: bool = False, sort_keys: bool = False) -> str:
    """string -> DOM -> string (parity with src/main.cpp:46-62); the
    parse honors the reference's relaxed flags (comments, trailing
    commas — rapidjson_helpers.hpp:16-19)."""
    return json.dumps(
        loads_relaxed(text), indent=4 if indent else None,
        sort_keys=sort_keys, ensure_ascii=False,
        separators=None if indent else (",", ":"),
    )


def str2geojson2str(text: str, indent: bool = False, sort_keys: bool = False) -> str:
    """string -> geojson round trip -> string (src/main.cpp:64-84).

    Routes the document through encode∘decode at max precision so the
    output reflects the engine's geojson normalization (coordinate
    quantization, property value canonicalization).
    """
    doc = decode(encode(loads_relaxed(text), max_precision=10**8))
    return json.dumps(
        doc, indent=4 if indent else None, sort_keys=sort_keys,
        ensure_ascii=False, separators=None if indent else (",", ":"),
    )
