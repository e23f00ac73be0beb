"""Snapshot-versioned parquet tables — Iceberg-style reads without Iceberg.

The north star frames the corpus as an Iceberg table; the library is not
in this container, so this module implements the load-bearing subset of
the table-format contract directly over parquet + JSON manifests:

* **Immutable data files**: every commit writes its rows under a fresh
  ``data/<commit-id>/`` directory — existing files are never rewritten
  or deleted by appends.
* **Manifest-pinned snapshots**: commit N is the manifest file
  ``v{N}.json`` listing every data directory visible at that version.
  A reader resolves ONE manifest and reads exactly those directories —
  concurrent or failed writers can never make it see a torn state.
* **Atomic commit**: the manifest is written to a temp name and
  ``os.rename``-ed into place (same-filesystem rename is atomic), the
  same crash-safety discipline as plans/manifest.py.
* **Time travel**: ``read_snapshot(version=K)`` reproduces any
  historical version bit-for-bit, because the data dirs it lists are
  immutable.

At cluster scale the manifest stays tiny (one JSON per commit listing
directories, not files) and reads prune to the listed dirs — the scan
itself is ordinary distributed parquet.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version}.json")


def snapshot_versions(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def write_snapshot(df: DataFrame, table_dir: str,
                   mode: str = "append",
                   batch_id: int | None = None,
                   partition_by: list[str] | None = None,
                   writer_options: dict | None = None) -> int:
    """Commit ``df`` as a new snapshot; returns the new version number.

    ``mode='append'`` makes the new version see prior data plus ``df``;
    ``mode='overwrite'`` starts the lineage over (old versions stay
    readable — nothing is deleted; retire them with a separate GC pass
    that drops dirs unreferenced by retained manifests).

    ``batch_id`` makes the commit IDEMPOTENT per id: if some manifest
    already records it, that version is returned and nothing is written
    — the contract a Structured Streaming ``foreachBatch`` sink needs
    for exactly-once output under micro-batch replay.
    """
    assert mode in ("append", "overwrite")
    versions = snapshot_versions(table_dir)
    if batch_id is not None:
        for v in versions:
            with open(_manifest_path(table_dir, v)) as fh:
                if json.load(fh).get("batch_id") == batch_id:
                    return v
    prev = versions[-1] if versions else 0
    commit_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, "data", commit_id)
    writer = df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(data_dir)

    dirs = [os.path.join("data", commit_id)]
    if mode == "append" and prev:
        with open(_manifest_path(table_dir, prev)) as fh:
            dirs = json.load(fh)["data_dirs"] + dirs
    version = prev + 1
    tmp = _manifest_path(table_dir, version) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        manifest = {"version": version, "data_dirs": dirs}
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        json.dump(manifest, fh)
    os.rename(tmp, _manifest_path(table_dir, version))
    return version


def snapshot_stream_sink(table_dir: str):
    """``foreachBatch`` function committing each micro-batch as an
    append snapshot, exactly-once: Spark replays a failed micro-batch
    with the SAME batch_id, and the batch_id-idempotent commit turns the
    replay into a no-op instead of duplicate rows.

        stream.writeStream.foreachBatch(snapshot_stream_sink(dir))...
    """
    def write(batch_df: DataFrame, batch_id: int) -> None:
        write_snapshot(batch_df, table_dir, mode="append",
                       batch_id=int(batch_id))

    return write


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Read the table as of ``version`` (default: latest)."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise FileNotFoundError(f"snapshot v{v} not found in {versions}")
    with open(_manifest_path(table_dir, v)) as fh:
        dirs = json.load(fh)["data_dirs"]
    return spark.read.parquet(*[os.path.join(table_dir, d) for d in dirs])


def read_changes(spark: SparkSession, table_dir: str,
                 from_version: int, to_version: int) -> DataFrame:
    """Incremental (CDC-style) read: rows ADDED between two snapshots.

    Because data dirs are immutable and manifests are append-lists, the
    delta is exactly the dirs in ``to`` that ``from`` does not list — an
    O(manifest) set difference, then an ordinary parquet scan of only
    the new dirs. The incremental-processing primitive: a downstream job
    consumes each commit's rows exactly once without re-scanning the
    table. (Overwrite commits restart lineage; a delta across an
    overwrite boundary raises rather than guessing.)
    """
    out_dirs = []
    for v in (from_version, to_version):
        with open(_manifest_path(table_dir, v)) as fh:
            out_dirs.append(json.load(fh)["data_dirs"])
    old, new = out_dirs
    if not set(old).issubset(new):
        raise ValueError(
            f"v{to_version} does not extend v{from_version} "
            "(overwrite boundary) — incremental read undefined")
    delta = [d for d in new if d not in set(old)]
    if not delta:
        return read_snapshot(spark, table_dir, to_version).limit(0)
    return spark.read.parquet(
        *[os.path.join(table_dir, d) for d in delta])


def compact_snapshot(spark: SparkSession, table_dir: str, key_col: str,
                     id_col: str, target_rows: int) -> int:
    """Rewrite the latest snapshot into the compaction plan's file counts.

    The maintenance pass plans/compaction.py plans for: read the current
    snapshot, join back the per-key planned file count (broadcast — plan
    cardinality is the key domain), route each row to a deterministic
    intra-key bucket (xxhash64 of its id, modulo the key's plan), and
    commit ONE overwrite snapshot laid out ``key=``-partitioned with at
    most the planned number of files per key. Data is bit-identical
    (pure rewrite); old versions remain time-travelable.
    """
    from pyspark.sql import functions as F

    from ..plans.compaction import compaction_plan

    cur = read_snapshot(spark, table_dir)
    plan = compaction_plan(cur, key_col, target_rows).select(
        key_col, "n_files")
    routed = (
        cur.join(F.broadcast(plan), key_col)
        .withColumn("_bucket", F.pmod(F.xxhash64(id_col), F.col("n_files")))
        .drop("n_files")
    )
    out = routed.repartition(F.col(key_col), F.col("_bucket")).drop("_bucket")
    # bucket routing parallelizes hot keys across tasks; maxRecordsPerFile
    # enforces the per-file bound WITHIN a task (several buckets of one
    # key hashed into the same task still split at the target), so the
    # per-key file count lands on the plan's ceil(n/target) regardless of
    # shuffle collisions
    return write_snapshot(out, table_dir, mode="overwrite",
                          partition_by=[key_col],
                          writer_options={"maxRecordsPerFile":
                                          str(int(target_rows))})


def vacuum_snapshots(table_dir: str, keep_versions: int = 1) -> dict:
    """Garbage-collect history: retain the newest ``keep_versions``
    manifests, delete older manifests and any data dir no retained
    manifest references. Returns {"kept": [...], "deleted_dirs": n,
    "deleted_manifests": n}.

    Safe by construction: the retained manifests' dir lists are closed
    under the append lineage (an append manifest lists all its
    ancestors' dirs), so a reader of any KEPT version never loses a
    file; only time travel past the horizon is given up.
    """
    import shutil

    assert keep_versions >= 1
    versions = snapshot_versions(table_dir)
    keep = versions[-keep_versions:]
    referenced: set[str] = set()
    for v in keep:
        with open(_manifest_path(table_dir, v)) as fh:
            referenced.update(json.load(fh)["data_dirs"])
    deleted_dirs = 0
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for name in os.listdir(data_root):
            rel = os.path.join("data", name)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name),
                              ignore_errors=True)
                deleted_dirs += 1
    deleted_manifests = 0
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(table_dir, v))
            deleted_manifests += 1
    return {"kept": keep, "deleted_dirs": deleted_dirs,
            "deleted_manifests": deleted_manifests}
