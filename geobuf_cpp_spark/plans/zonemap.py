"""Zone maps — per-file min/max stats and file-skipping reads.

Iceberg/Delta skip files by column stats in their manifests; plain
parquet directories lose that once the query predicate isn't a partition
column. This module rebuilds the capability from primitives:

* ``collect_zone_map`` — one distributed scan producing (file, min, max)
  per tracked column via ``input_file_name()`` + a hash aggregate
  (output bounded by the file count, not rows).
* ``prune_files`` — the planning step: files whose [min, max] interval
  intersects the predicate range. Pure metadata, O(files).
* ``zone_pruned_read`` — read ONLY surviving files and re-apply the
  exact predicate (zone maps are a superset filter, never a substitute).

Effectiveness depends on layout: a range-clustered write (e.g.
``df.repartitionByRange(col)``, or the cell-prefix layouts the engine's
sinks produce) gives near-disjoint per-file ranges and near-perfect
skipping; a random layout degrades gracefully to reading everything.
Persist the zone map next to the data and refresh it per commit — it is
itself a tiny DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def collect_zone_map(spark: SparkSession, path: str,
                     cols: list[str]) -> DataFrame:
    """(file, <c>_min, <c>_max ...) per parquet file under ``path``."""
    assert cols
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(F.col("_file").alias("file")).agg(*aggs)


def prune_files(zone_map: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose [min, max] interval intersects [lo, hi] — the O(files)
    planning step (zone_map is file-count sized; collect is bounded)."""
    rows = (
        zone_map.where(
            (F.col(f"{col}_max") >= F.lit(lo))
            & (F.col(f"{col}_min") <= F.lit(hi))
        )
        .select("file")
        .collect()
    )
    return [r["file"] for r in rows]


def zone_pruned_read(spark: SparkSession, zone_map: DataFrame,
                     col: str, lo, hi) -> DataFrame:
    """Range query reading only zone-map-surviving files; the exact
    predicate is re-applied (stats prune files, they never answer)."""
    files = prune_files(zone_map, col, lo, hi)
    if not files:
        raise ValueError(
            "no file intersects the range — read the empty result from "
            "the base path instead of guessing a schema here")
    return (
        spark.read.parquet(*files)
        .where((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )
