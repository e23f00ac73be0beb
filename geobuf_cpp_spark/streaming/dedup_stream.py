"""Streaming exact dedup — first-seen-wins over an unbounded ingest.

The streaming twin of ``operators.dedup.exact_dedup``: as document files
land (the Common-Crawl dump cadence), emit each distinct text exactly
once, keyed by content digest. ``dropDuplicates`` on the digest keeps
per-key state in the state store; the watermark bounds that state — a
duplicate arriving later than the watermark window re-emits (the batch
job downstream re-dedups), which is the standard state/completeness
trade at unbounded scale.

First-seen-wins here is ARRIVAL order (micro-batch order), matching what
a real ingest can know online; the batch twin's deterministic
min(doc_id) keeper is the reconciliation rule, and the two agree
whenever files land in doc_id order (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = (
    "doc_id long, ts timestamp, text string, lang string, source string"
)


def read_doc_stream(spark: SparkSession, source_dir: str,
                    max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def dedup_stream(docs: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Emit the first arrival of each distinct text; state evicts past
    the event-time watermark."""
    return (
        docs.withColumn("_fp", F.md5(F.col("text").cast("binary")))
        .withWatermark("ts", watermark)
        .dropDuplicates(["_fp"])
        .drop("_fp")
    )
