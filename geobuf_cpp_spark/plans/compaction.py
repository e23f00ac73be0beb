"""Compaction planning — the small-files answer for materialization.

A 1000-executor write of a cell-partitioned corpus emits
(tasks x live prefixes) files; left alone, the table decays into
millions of KB-sized parquet files and every subsequent scan pays
open/footer costs instead of IO. The planner is one aggregate over the
storage key: per prefix, the row count and the file count a compacting
writer should coalesce to at a target rows-per-file — exact integer
ceiling division, cheap enough to run per write. Feed the result to
``DataFrameWriter.repartitionByRange``/``repartition(n, key)`` per
prefix, or to a maintenance pass that rewrites only prefixes where
``n_files`` shrinks (the usual OPTIMIZE shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def compaction_plan(df: DataFrame, key_col: str,
                    target_rows: int) -> DataFrame:
    """(key, n_rows, n_files) per storage key; n_files = ceil(n/target).

    One map-side-combined hash aggregate on the storage key — output
    cardinality is the prefix domain, never the corpus.
    """
    t = int(target_rows)
    assert t > 0
    return (
        df.groupBy(key_col)
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            key_col,
            "n_rows",
            F.expr(f"(n_rows + {t - 1}) div {t}").cast("long")
            .alias("n_files"),
        )
    )
