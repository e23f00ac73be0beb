"""Explicit partitioning + skew mitigation (BASELINE.json north_rule).

Web geometries cluster in cities, so a handful of cells carry most rows.
Helpers here keep shuffles balanced without changing results:

* ``repartition_by_cell_prefix`` — hash-shuffle on the cell's parent at a
  coarser resolution, co-locating spatially-near rows (tile/cell pipelines
  reuse the same partitioning across stages, avoiding repeat shuffles).
* ``with_salt`` / ``salted_count`` — two-phase aggregation over a salted
  key: partial agg on (key, salt), final agg on key. Identical results to
  a plain groupBy, but the hot key's rows spread over ``n_salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import sql_cell_parent


# memo for spread()'s split-count probe: getNumPartitions() forces one
# physical-planning pass per call, which a 100-stage pipeline would pay
# twice per operator. Outer key: the SparkSession itself via a WEAK
# reference — a stopped session's entries evict with it and a recycled
# object address can never serve another session's counts. Inner key: the
# ANALYZED plan's semanticHash (cheap, no physical planning). The memo is
# a HINT only: a hash collision or a scan whose underlying files changed
# mid-session only risks skipping/adding a benign repartition, never a
# wrong result. Inner dicts are size-capped so a long-lived session
# running many distinct plans cannot accrete entries forever.
import weakref

_SPREAD_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_SPREAD_MEMO_CAP = 512


def spread(df: DataFrame, multiple: int = 1, force: bool = False,
           n_splits: int | None = None) -> DataFrame:
    """Round-robin repartition to cluster parallelism — only when needed.

    Heavy per-row UDF stages and wide joins must not inherit the scan's
    split count (a small dimension table is often ONE parquet split, which
    would serialize the stage on a single core). One cheap shuffle buys
    full-width execution; results are unchanged.

    Conditional by design: when the input already has at least
    ``parallelism * multiple`` splits (the normal case at 100 TB, where the
    scan's split count exceeds cluster parallelism), repartitioning would be
    a pure-waste full shuffle of the corpus — so it is skipped. ``force``
    restores the unconditional behavior for layout-sensitive callers;
    ``n_splits`` lets callers that already know the scan layout skip the
    probe entirely.
    """
    # streaming frames: no .rdd probe is possible and micro-batch
    # parallelism is the source's own concern — pass through untouched
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if not force:
        if n_splits is None:
            per_session = _SPREAD_MEMO.setdefault(df.sparkSession, {})
            key = df.semanticHash()
            n_splits = per_session.get(key)
            if n_splits is None:
                n_splits = df.rdd.getNumPartitions()
                if len(per_session) >= _SPREAD_MEMO_CAP:
                    per_session.clear()
                per_session[key] = n_splits
        if n_splits >= target:
            return df
    return df.repartition(target)


def spread_groups(df: DataFrame, *keys: str, multiple: int = 1) -> DataFrame:
    """Hash-repartition on grouping keys to cluster parallelism — the
    ``spread`` discipline for ``groupBy(keys).applyInPandas`` stages.

    A grouped Python stage inherits the groupBy exchange's partition
    count, and AQE's partition coalescing sizes that exchange by BYTES:
    a small-byte group table (the normal case when groups are the unit
    of heavy Python work — file sinks, per-entity geometry, per-tile
    rasters) coalesces to one or two tasks, serializing every group
    function on a single core (measured on the geobuf file sink: 64
    groups collapsed to one task, 3.5 s wall for ~0.2 s of spread-out
    work). An explicit user repartition on the SAME keys both satisfies
    the groupBy's required distribution (no second exchange appears)
    and is exempt from AQE coalescing, so the group functions fan out
    across every core. Same-keyed groups still co-locate — results are
    unchanged.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    return df.repartition(target, *keys)


def repartition_by_cell_prefix(df: DataFrame, cell_col: str, res: int,
                               prefix_res: int, num_partitions: int) -> DataFrame:
    parent = F.expr(sql_cell_parent(cell_col, res, prefix_res))
    return df.repartition(num_partitions, parent)


def materialize_geobuf(features_df, out_dir: str, res: int = 8,
                       prefix_res: int = 3,
                       lon_col: str = "lon", lat_col: str = "lat",
                       num_partitions: int | None = None):
    """Write encoded features as parquet laid out by cell prefix.

    The storage layout stage of the 100 TB pipeline: rows hash-shuffle on
    their coarse cell (`repartition_by_cell_prefix`) so spatially-near
    features co-locate, then land under `cell_prefix=` directories —
    subsequent spatial reads prune partitions by prefix (verified via
    PushedFilters/partition pruning on the read side).
    """
    from ..functions.cells import sql_cell, sql_cell_parent
    from ..functions.udfs import encode_features

    spark = features_df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    encoded = encode_features(features_df)
    laid_out = (
        encoded.withColumn("cell", F.expr(sql_cell(lat_col, lon_col, res)))
        .withColumn(
            "cell_prefix", F.expr(sql_cell_parent("cell", res, prefix_res))
        )
    )
    laid_out = laid_out.repartition(n, F.col("cell_prefix"))
    laid_out.write.mode("overwrite").partitionBy("cell_prefix").parquet(out_dir)
    return spark.read.parquet(out_dir)


def with_salt(df: DataFrame, n_salt: int, salt_col: str = "_salt",
              salt_cols: list[str] | None = None) -> DataFrame:
    """Add a salt column that is genuinely row-spreading.

    Default source is the row's physical position
    (``monotonically_increasing_id`` = partition id << 33 + in-partition
    counter), so consecutive rows of a hot key cycle through all ``n_salt``
    values — a hot key's rows always fan out, even when the frame was
    already projected down to just the group key (the failure mode of
    hashing column values: every row of a hot key hashes identically).
    Pass ``salt_cols`` to derive the salt from column content instead when
    a content-deterministic salt is required (e.g. co-salting two sides of
    a join); callers must then include a row-unique column.

    Determinism note: the positional salt depends on shuffle fetch order,
    so a PARTIAL stage re-execution could observe different salts per row.
    Spark classifies such stages indeterminate and rolls back whole stages
    on retry (SPARK-23207), which is what keeps salted aggregates exact
    under failure — results rely on that mechanism, not on salt stability.
    Content-derived ``salt_cols`` with a row-unique column sidesteps the
    dependency when one is available.
    """
    if salt_cols:
        src = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salt))
    else:
        src = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    return df.withColumn(salt_col, src.cast("int"))


def salted_count(df: DataFrame, key_cols: list[str], n_salt: int = 16,
                 salt_cols: list[str] | None = None) -> DataFrame:
    """count() per key via two-phase salted aggregation.

    Phase 1 shuffles on (key, salt) — the hot key fans out over ``n_salt``
    partial aggregates (position-derived salt, see ``with_salt``); phase 2
    merges the (at most n_salt) partials per key. Result rows are identical
    to ``df.groupBy(key).count()`` for any CONSISTENT salt assignment;
    under partial retries that consistency comes from Spark's
    indeterminate-stage rollback (see ``with_salt``'s determinism note).
    """
    salted = with_salt(df, n_salt, salt_cols=salt_cols)
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))
