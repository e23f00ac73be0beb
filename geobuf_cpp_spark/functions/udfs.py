"""Arrow-batched Spark transforms: extraction + geobuf codec stages.

All heavy work happens inside ``mapInPandas`` generators (Arrow batches in,
Arrow batches out — no per-row Python at the DataFrame boundary, per
BASELINE.json input_hint). The codec kernels themselves are numpy-vectorized
(codec/pbf.py); the per-feature message scaffolding is smaller than the
Arrow transfer cost at this payload size.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from ..codec import geobuf as gb
from ..extract.html import extract_geometries
from .geometry import geojson_to_wire, wire_to_geojson

GEOM_STRUCT = "struct<type: tinyint, dim: tinyint, lengths: array<int>, coords: array<double>>"

# the reference's signature extension: arbitrary extra JSON members on
# geometry / feature / feature collection, wire tag 15
# (src/geobuf/geobuf.cpp:381-383,402-404,443-445; README.md:39). Carried as
# canonical-JSON-fragment maps, same encoding as ``properties`` —
# feature-level and geometry-level each get a column (SURVEY §1.4).
CUSTOM_MAPS = (
    ", custom_properties map<string,string>"
    ", geom_custom_properties map<string,string>"
)

FEATURES_SCHEMA = (
    "url string, feature_idx int, kind string, lon double, lat double, "
    f"geom {GEOM_STRUCT}, properties map<string,string>{CUSTOM_MAPS}"
)

DECODED_SCHEMA = (
    "url string, feature_idx int, precision int, dim int, "
    f"geom {GEOM_STRUCT}, properties map<string,string>{CUSTOM_MAPS}"
)


def _props_to_json_map(props: dict) -> dict[str, str]:
    """Property map with canonical-JSON fragment values (lossless for the
    6 wire value kinds incl. the int/double distinction)."""
    return {k: gb.json_dumps_canonical(v) for k, v in props.items()}


def _json_map_to_props(m: dict[str, str] | None) -> dict:
    return {k: json.loads(v) for k, v in (m or {}).items()}


def _feature_customs(feature: dict) -> dict[str, str]:
    """Feature-level custom members (everything beyond the GeoJSON schema)."""
    return _props_to_json_map(gb._custom_props(feature, gb._FEATURE_STD_KEYS))


def _geom_customs(geom_json: dict | None) -> dict[str, str]:
    if not geom_json:
        return {}
    return _props_to_json_map(gb._custom_props(geom_json, gb._GEOMETRY_STD_KEYS))


def extract_features(pages_df):
    """pages(url, html, ...) -> one row per extracted geo feature.

    The representative (lon, lat) is the first coordinate of the geometry —
    the anchor for cell assignment of point payloads (exact for Points,
    a prefilter anchor for lines/polygons).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = bytes(html).decode("utf-8", errors="replace")
                for idx, feat in enumerate(extract_geometries(text)):
                    t, dim, lengths, coords = geojson_to_wire(feat["geometry"])
                    rows.append(
                        {
                            "url": url,
                            "feature_idx": idx,
                            "kind": feat["kind"],
                            "lon": coords[0],
                            "lat": coords[1],
                            "geom": {
                                "type": t,
                                "dim": dim,
                                "lengths": lengths,
                                "coords": coords,
                            },
                            "properties": _props_to_json_map(feat["properties"]),
                            # HTML extraction yields no custom members
                            "custom_properties": {},
                            "geom_custom_properties": {},
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "feature_idx", "kind", "lon", "lat", "geom",
                    "properties", "custom_properties", "geom_custom_properties",
                ],
            )

    return pages_df.select("url", "html").mapInPandas(gen, FEATURES_SCHEMA)


def encode_features(features_df, max_precision: int = 10**7):
    """Append a ``geobuf`` binary column — one encoded Feature per row.

    Input needs at least (geom, properties); all input columns pass through.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in features_df.schema.fields
    ) + ", geobuf binary"

    has_custom = "custom_properties" in features_df.columns
    has_geom_custom = "geom_custom_properties" in features_df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = gb.Encoder(max_precision=max_precision)
        for pdf in batches:
            encoded = []
            customs = pdf["custom_properties"] if has_custom else [None] * len(pdf)
            gcustoms = (
                pdf["geom_custom_properties"] if has_geom_custom
                else [None] * len(pdf)
            )
            for geom, props, custom, gcustom in zip(
                pdf["geom"], pdf["properties"], customs, gcustoms
            ):
                geometry = wire_to_geojson(
                    geom["type"], geom["dim"], geom["lengths"], geom["coords"]
                )
                if gcustom:
                    geometry.update(_json_map_to_props(gcustom))
                feature = {
                    "type": "Feature",
                    "geometry": geometry,
                    "properties": _json_map_to_props(props),
                }
                if custom:
                    feature.update(_json_map_to_props(custom))
                encoded.append(enc.encode(feature))
            out = pdf.copy()
            out["geobuf"] = encoded
            yield out

    return features_df.mapInPandas(gen, out_schema)


def extract_encode_features(pages_df, max_precision: int = 10**7):
    """Fused extract+encode in ONE Arrow stage.

    Chaining two mapInPandas stages spawns two Python workers per task and
    pays an extra Arrow round trip; the fused stage halves worker count and
    transfer volume — the difference is ~2x steady-state throughput on the
    headline pipeline and much cheaper worker warmup on wide executors.
    """
    enc = gb.Encoder(max_precision=max_precision)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = bytes(html).decode("utf-8", errors="replace")
                for idx, feat in enumerate(extract_geometries(text)):
                    t, dim, lengths, coords = geojson_to_wire(feat["geometry"])
                    blob = enc.encode(
                        {
                            "type": "Feature",
                            "geometry": feat["geometry"],
                            "properties": feat["properties"],
                        }
                    )
                    rows.append(
                        {
                            "url": url,
                            "feature_idx": idx,
                            "kind": feat["kind"],
                            "lon": coords[0],
                            "lat": coords[1],
                            "geom": {
                                "type": t,
                                "dim": dim,
                                "lengths": lengths,
                                "coords": coords,
                            },
                            "properties": _props_to_json_map(feat["properties"]),
                            "custom_properties": {},
                            "geom_custom_properties": {},
                            "geobuf": blob,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "feature_idx", "kind", "lon", "lat", "geom",
                    "properties", "custom_properties",
                    "geom_custom_properties", "geobuf",
                ],
            )

    return pages_df.select("url", "html").mapInPandas(
        gen, FEATURES_SCHEMA + ", geobuf binary"
    )


def encode_feature_collections(features_df, max_precision: int = 10**7):
    """Group features per url into one FeatureCollection geobuf blob.

    The distributed twin of the reference's writeFeatureCollection
    (geobuf.cpp:374-384): ``groupBy(url).applyInPandas`` — one shuffle on
    url, then a single encode per group so the collection shares one keys
    table and one precision header. Optional input columns
    ``custom_properties`` / ``geom_custom_properties`` (per feature) and
    ``fc_custom_properties`` (constant per url — first row wins) ride the
    wire as tag-15 custom members, matching the reference's extension.
    """
    import pandas as pd

    cols = set(features_df.columns)
    has_custom = "custom_properties" in cols
    has_geom_custom = "geom_custom_properties" in cols
    has_fc_custom = "fc_custom_properties" in cols

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        enc = gb.Encoder(max_precision=max_precision)
        pdf = pdf.sort_values("feature_idx")
        customs = pdf["custom_properties"] if has_custom else [None] * len(pdf)
        gcustoms = (
            pdf["geom_custom_properties"] if has_geom_custom
            else [None] * len(pdf)
        )
        features = []
        for geom, props, custom, gcustom in zip(
            pdf["geom"], pdf["properties"], customs, gcustoms
        ):
            geometry = wire_to_geojson(
                geom["type"], geom["dim"], geom["lengths"], geom["coords"]
            )
            if gcustom:
                geometry.update(_json_map_to_props(gcustom))
            feature = {
                "type": "Feature",
                "geometry": geometry,
                "properties": _json_map_to_props(props),
            }
            if custom:
                feature.update(_json_map_to_props(custom))
            features.append(feature)
        fc: dict = {"type": "FeatureCollection", "features": features}
        if has_fc_custom and pdf["fc_custom_properties"].iloc[0]:
            fc.update(_json_map_to_props(pdf["fc_custom_properties"].iloc[0]))
        blob = enc.encode(fc)
        return pd.DataFrame(
            {
                "url": [pdf["url"].iloc[0]],
                "n_features": [len(features)],
                "geobuf": [blob],
            }
        )

    select_cols = ["url", "feature_idx", "geom", "properties"] + [
        c for c in ("custom_properties", "geom_custom_properties",
                    "fc_custom_properties") if c in cols
    ]
    return features_df.select(*select_cols).groupBy("url").applyInPandas(
        encode_group, "url string, n_features int, geobuf binary"
    )


def decode_feature_collections(fc_df, blob_col: str = "geobuf",
                               key_col: str = "url"):
    """Inverse of ``encode_feature_collections``: one FC blob row ->
    feature rows (explode), geometry back in wire shape."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = gb.Decoder()
        for pdf in batches:
            rows = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                doc = dec.decode(bytes(blob))
                fc_customs = _props_to_json_map(
                    gb._custom_props(doc, gb._FC_STD_KEYS)
                )
                for idx, feat in enumerate(doc.get("features", [])):
                    geom_json = feat.get("geometry")
                    if not geom_json:
                        continue
                    t, dim, lengths, coords = geojson_to_wire(geom_json)
                    rows.append(
                        {
                            key_col: key,
                            "feature_idx": idx,
                            "geom": {
                                "type": t,
                                "dim": dim,
                                "lengths": lengths,
                                "coords": coords,
                            },
                            "properties": _props_to_json_map(
                                feat.get("properties") or {}
                            ),
                            "custom_properties": _feature_customs(feat),
                            "geom_custom_properties": _geom_customs(geom_json),
                            "fc_custom_properties": fc_customs,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[key_col, "feature_idx", "geom", "properties",
                               "custom_properties", "geom_custom_properties",
                               "fc_custom_properties"]
            )

    return fc_df.select(key_col, blob_col).mapInPandas(
        gen,
        f"{key_col} string, feature_idx int, geom {GEOM_STRUCT}, "
        f"properties map<string,string>{CUSTOM_MAPS}"
        ", fc_custom_properties map<string,string>",
    )


def decode_features(encoded_df):
    """Decode ``geobuf`` binaries back to wire-shaped geometry + props."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = gb.Decoder()
        for pdf in batches:
            rows = []
            for url, idx, blob in zip(pdf["url"], pdf["feature_idx"], pdf["geobuf"]):
                feature = dec.decode(bytes(blob))
                geom_json = feature.get("geometry")
                t, dim, lengths, coords = geojson_to_wire(geom_json)
                rows.append(
                    {
                        "url": url,
                        "feature_idx": int(idx),
                        "precision": dec.precision,
                        "dim": dec.dim,
                        "geom": {
                            "type": t,
                            "dim": dim,
                            "lengths": lengths,
                            "coords": coords,
                        },
                        "properties": _props_to_json_map(feature.get("properties") or {}),
                        "custom_properties": _feature_customs(feature),
                        "geom_custom_properties": _geom_customs(geom_json),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "feature_idx", "precision", "dim", "geom",
                         "properties", "custom_properties",
                         "geom_custom_properties"],
            )

    return encoded_df.select("url", "feature_idx", "geobuf").mapInPandas(
        gen, DECODED_SCHEMA
    )
