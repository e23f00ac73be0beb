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

FEATURES_SCHEMA = (
    "url string, feature_idx int, kind string, lon double, lat double, "
    f"geom {GEOM_STRUCT}, properties map<string,string>"
)

DECODED_SCHEMA = (
    "url string, feature_idx int, precision int, dim int, "
    f"geom {GEOM_STRUCT}, properties map<string,string>"
)


def _props_to_json_map(props: dict) -> dict[str, str]:
    """Property map with canonical-JSON fragment values (lossless for the
    6 wire value kinds incl. the int/double distinction)."""
    return {k: gb.json_dumps_canonical(v) for k, v in props.items()}


def _json_map_to_props(m: dict[str, str] | None) -> dict:
    return {k: json.loads(v) for k, v in (m or {}).items()}


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
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "feature_idx", "kind", "lon", "lat", "geom", "properties",
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

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = gb.Encoder(max_precision=max_precision)
        for pdf in batches:
            encoded = []
            for geom, props in zip(pdf["geom"], pdf["properties"]):
                feature = {
                    "type": "Feature",
                    "geometry": wire_to_geojson(
                        geom["type"], geom["dim"], geom["lengths"], geom["coords"]
                    ),
                    "properties": _json_map_to_props(props),
                }
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
                            "geobuf": blob,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "feature_idx", "kind", "lon", "lat",
                    "geom", "properties", "geobuf",
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
    table and one precision header.
    """
    import pandas as pd

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        enc = gb.Encoder(max_precision=max_precision)
        pdf = pdf.sort_values("feature_idx")
        features = []
        for geom, props in zip(pdf["geom"], pdf["properties"]):
            features.append(
                {
                    "type": "Feature",
                    "geometry": wire_to_geojson(
                        geom["type"], geom["dim"], geom["lengths"], geom["coords"]
                    ),
                    "properties": _json_map_to_props(props),
                }
            )
        blob = enc.encode({"type": "FeatureCollection", "features": features})
        return pd.DataFrame(
            {
                "url": [pdf["url"].iloc[0]],
                "n_features": [len(features)],
                "geobuf": [blob],
            }
        )

    return features_df.groupBy("url").applyInPandas(
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
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[key_col, "feature_idx", "geom", "properties"]
            )

    return fc_df.select(key_col, blob_col).mapInPandas(
        gen,
        f"{key_col} string, feature_idx int, geom {GEOM_STRUCT}, "
        "properties map<string,string>",
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
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "feature_idx", "precision", "dim", "geom", "properties"],
            )

    return encoded_df.select("url", "feature_idx", "geobuf").mapInPandas(
        gen, DECODED_SCHEMA
    )
