"""Streaming quantile telemetry — the mergeable sketch over micro-batches.

Composition of three engine pieces: Structured Streaming micro-batches,
the deterministic quantile sketch (``operators.qsketch`` — EXACTLY
associative merge), and snapshot-versioned tables (``sources.snapshots``
— batch_id-idempotent commits). Each micro-batch's sketch merges into
the running sketch and commits as a new snapshot version; because the
merge is exact, the final table EQUALS the batch-built sketch of the
whole stream row for row (asserted in tests) — the property randomized
sketches (KLL, t-digest) cannot offer a streaming pipeline.

Exactly-once: a replayed micro-batch re-commits under the same
batch_id, which the snapshot layer resolves to the already-committed
version — the merge never double-counts. State lives in the snapshot
table (bounded: <= ~2k rows per group), not in Spark's state store, so
any job restart resumes from the last committed version.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.qsketch import merge_sketches, quantile_sketch
from ..sources.snapshots import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)


def sketch_stream_sink(table_dir: str, value_sql: str, group_col: str):
    """``foreachBatch`` function: merge each micro-batch's sketch into
    the running sketch and commit one snapshot version per batch.

        stream.writeStream.foreachBatch(
            sketch_stream_sink(dir, "CAST(round(value*100) AS BIGINT)",
                               "event_type"))
    """
    def write(batch_df, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        delta = quantile_sketch(batch_df, value_sql, group_col)
        if snapshot_versions(table_dir):
            merged = merge_sketches(read_snapshot(spark, table_dir), delta)
        else:
            merged = delta
        # overwrite = the new running total; batch_id makes the commit
        # idempotent under micro-batch replay (no double-merge)
        write_snapshot(merged, table_dir, mode="overwrite",
                       batch_id=int(batch_id))

    return write
