"""Structured Streaming surface: windowed event aggregation with late data.

The reference is batch-only; the engine adds the streaming shape a
web-scale ingest needs: file-source streams (each micro-batch = newly
landed parquet/json under a prefix, the Common-Crawl dump cadence),
event-time windows with a watermark for late arrivals, and an idempotent
sink contract (checkpointed, exactly-once per micro-batch).

``windowed_counts`` is the streaming twin of the batch ``events_hourly``
query — same grouping semantics, so a stream caught up to a static prefix
must equal the batch answer (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, source_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed aggregation; late rows beyond the watermark drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "min_value", "max_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, checkpoint: str,
                  output_mode: str = "complete"):
    """Drain all available input into an in-memory table (test/dev sink).

    ``complete`` suits aggregations; row-level operators (dedup, maps)
    only support ``append``.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    return q


def run_to_parquet(stream_df: DataFrame, out_dir: str, checkpoint: str):
    """Production shape: append sink + checkpoint = exactly-once resume."""
    return (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _ping_cell_expr(res: int) -> str:
    """Shared SQL: grid cell id of a ping's centidegree lattice coords
    (the IPINGS contract: lat = (iy-8500)/100, lon = (ix-18000)/100) —
    the same cell layout every batch spatial operator uses."""
    from geobuf_cpp_spark.functions.cells import sql_cell

    return sql_cell("((iy - 8500) / 100.0)", "((ix - 18000) / 100.0)", res)


def cell_hotspot_counts(pings: DataFrame, res: int = 8,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming geo hotspots: event-time windowed per-cell ping counts.

    The streaming half of the cell-index story — the batch engine rolls
    pings up to cells after the fact; a live ingest wants the same
    rollup per event-time window with late arrivals bounded by the
    watermark (state evicts once a window passes it). Works on a
    streaming OR batch DataFrame: the batch twin is the same expression
    with the watermark a no-op, which is what makes stream == batch
    assertable and the twin oracle-gateable.

    Output: (window_start, cell, n_pings, max_event_id). max_event_id
    is the deterministic "latest ping" witness (floats and distincts
    are deliberately absent — append-mode streaming aggs want
    watermark-evictable, merge-friendly state)."""
    cell = F.expr(_ping_cell_expr(res))
    src = pings
    if pings.isStreaming:
        src = pings.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), cell.alias("cell"))
        .agg(
            F.count("*").cast("long").alias("n_pings"),
            F.max("event_id").cast("long").alias("max_event_id"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "cell", "n_pings", "max_event_id",
        )
    )
