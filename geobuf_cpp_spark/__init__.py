"""geobuf_cpp_spark — a PySpark-native spatial analytics engine.

Capabilities modeled on district10/geobuf-cpp (Geobuf codec, GeoJSON data
model) re-expressed Spark-first, plus the spatial-join / tiling / kNN query
surface and web-scale training-data operators (dedup, similarity search,
text analysis) the engine serves at cluster scale.
"""

__version__ = "0.1.0"
