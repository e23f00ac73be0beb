"""Web-page geometry + text extraction (the engine's reference extractor).

Mandated by BASELINE.json north_star: extract geotagged coordinates
(``geo.position`` / ICBM meta tags), embedded GeoJSON blocks
(``application/geo+json`` scripts), and JSON-LD GeoCoordinates microdata
from Common-Crawl-style pages, with byte-identical extracted text per url.

This module IS the locked reference implementation both for tests and for
the per-url "byte-identical extracted text" invariant — it is deliberately
regex-based, dependency-free, and deterministic. The Spark layer wraps
these functions in Arrow-batched ``mapInPandas`` (no per-row Python at the
DataFrame API surface).
"""

from __future__ import annotations

import json
import re

_RE_META_GEO = re.compile(
    r'<meta\s+name="geo\.position"\s+content="([^";]+);([^"]+)"\s*/?>', re.I
)
_RE_META_ICBM = re.compile(
    r'<meta\s+name="ICBM"\s+content="([^",]+),\s*([^"]+)"\s*/?>', re.I
)
_RE_GEOJSON = re.compile(
    r'<script\s+type="application/geo\+json">(.*?)</script>', re.S | re.I
)
_RE_JSONLD = re.compile(
    r'<script\s+type="application/ld\+json">(.*?)</script>', re.S | re.I
)
_RE_SCRIPT_STYLE = re.compile(r"<(script|style)\b.*?</\1>", re.S | re.I)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"\s+")


def extract_text(html: str) -> str:
    """Deterministic text extraction — the locked per-url golden.

    Drop script/style blocks, strip tags, collapse whitespace. Byte-stable:
    pure function of the html string.
    """
    no_scripts = _RE_SCRIPT_STYLE.sub(" ", html)
    no_tags = _RE_TAG.sub(" ", no_scripts)
    return _RE_WS.sub(" ", no_tags).strip()


def extract_geometries(html: str) -> list[dict]:
    """All geo payloads of one page, in document order of kind.

    Returns dicts: {kind, geometry (GeoJSON dict), properties (dict)}.
    Malformed payloads are skipped, never raised.
    """
    out: list[dict] = []
    for m in _RE_META_GEO.finditer(html):
        lat, lon = _parse_latlon(m.group(1), m.group(2))
        if lat is not None:
            out.append(
                {
                    "kind": "meta.geo.position",
                    "geometry": {"type": "Point", "coordinates": [lon, lat]},
                    "properties": {},
                }
            )
    for m in _RE_META_ICBM.finditer(html):
        lat, lon = _parse_latlon(m.group(1), m.group(2))
        if lat is not None:
            out.append(
                {
                    "kind": "meta.icbm",
                    "geometry": {"type": "Point", "coordinates": [lon, lat]},
                    "properties": {},
                }
            )
    for m in _RE_GEOJSON.finditer(html):
        try:
            doc = json.loads(m.group(1))
        except ValueError:
            continue
        for geom, props in _flatten_geojson(doc):
            out.append({"kind": "geojson", "geometry": geom, "properties": props})
    for m in _RE_JSONLD.finditer(html):
        try:
            doc = json.loads(m.group(1))
        except ValueError:
            continue
        geo = doc.get("geo") if isinstance(doc, dict) else None
        if isinstance(geo, dict) and geo.get("@type") == "GeoCoordinates":
            try:
                lat = float(geo["latitude"])
                lon = float(geo["longitude"])
            except (KeyError, TypeError, ValueError):
                continue
            props = {"name": doc["name"]} if isinstance(doc.get("name"), str) else {}
            out.append(
                {
                    "kind": "jsonld",
                    "geometry": {"type": "Point", "coordinates": [lon, lat]},
                    "properties": props,
                }
            )
    return out


def _valid_coords(coords) -> bool:
    """Finite, non-empty coordinate structure (malformed payloads skip)."""
    if not isinstance(coords, list) or not coords:
        return False

    def walk(c):
        if isinstance(c, (int, float)):
            return isinstance(c, (int, float)) and not isinstance(c, bool) and \
                -1e308 < float(c) < 1e308 and float(c) == float(c)
        if isinstance(c, list) and c:
            return all(walk(s) for s in c)
        return False

    return walk(coords)


def _parse_latlon(a: str, b: str):
    try:
        lat, lon = float(a.strip()), float(b.strip())
    except ValueError:
        return None, None
    if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
        return None, None
    return lat, lon


def _flatten_geojson(doc: dict):
    """GeoJSON document -> [(geometry, properties)] rows.

    GeometryCollections explode to one row per member geometry (the wire
    geometry struct is flat; collections are rows, not objects — SURVEY
    §1.4 Spark mapping).
    """
    if not isinstance(doc, dict):
        return
    t = doc.get("type")
    if t == "FeatureCollection":
        for f in doc.get("features", []):
            yield from _flatten_geojson(f)
    elif t == "Feature":
        geom = doc.get("geometry")
        props = doc.get("properties") or {}
        if isinstance(geom, dict) and geom.get("type") == "GeometryCollection":
            for sub in geom.get("geometries", []):
                for g, _ in _flatten_geojson(sub):
                    yield g, props
        elif geom:
            yield geom, props
    elif t == "GeometryCollection":
        for sub in doc.get("geometries", []):
            yield from _flatten_geojson(sub)
    elif t in ("Point", "MultiPoint", "LineString", "MultiLineString",
               "Polygon", "MultiPolygon"):
        if _valid_coords(doc.get("coordinates")):
            yield doc, {}
