"""As-of join: for each left row, the most recent right row at or before
its time, per key — the operator Spark SQL lacks natively.

Implemented WITHOUT a join: both sides union into one stream tagged by
side, ONE shuffle on the key orders (time, side) per key, and a running
``last(right_payload, ignorenulls)`` window carries the newest right row
forward onto every left row. Cost = one shuffle + one window pass over
|L| + |R| rows; no per-key loop, no range-join explosion. Right rows at
exactly the left row's time match (``l.time >= r.time``), because the
side tag sorts right-before-left within a timestamp.

The right payload rides as ONE struct per row, so a right row whose
payload columns are themselves NULL still participates (``ignorenulls``
skips only rows from the left side).

Skew note: a hot key serializes its window partition — inherent to as-of
ordering semantics (salting would break the order). Mitigate upstream by
time-bucketing the key when the use case allows stale matches.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` — the gate compares exact row
sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              time_col: str, right_cols: dict[str, str]) -> DataFrame:
    """left columns + the as-of matched right columns (renamed per
    ``right_cols`` {right_col: output_name}; NULL when no right row at or
    before the left row's time exists for the key)."""
    left_payload = [c for c in left.columns if c not in key_cols]
    tagged_l = left.select(
        *key_cols,
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left_payload).alias("_lp"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{out}: {right.schema[src].dataType.simpleString()}"
                for src, out in right_cols.items()
            ) + ">"
        ).alias("_rp"),
    )
    tagged_r = right.select(
        *key_cols,
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(tagged_l.schema["_lp"].dataType.simpleString()).alias("_lp"),
        F.struct(
            *[F.col(src).alias(out) for src, out in right_cols.items()]
        ).alias("_rp"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # _rp in the ordering: two RIGHT rows tying on (key, time) resolve to
    # the largest payload struct (lexicographic) instead of partition
    # order — deterministic across retries/shuffles. Left rows carry NULL
    # _rp; their relative order within a tie is irrelevant (each computes
    # its own output row).
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_rp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    out_cols = (
        [F.col(c) for c in key_cols]
        + [F.col(f"_lp.{c}").alias(c) for c in left_payload]
        + [F.col(f"_match.{out}").alias(out) for out in right_cols.values()]
    )
    return carried.filter(F.col("_side") == 1).select(*out_cols)
