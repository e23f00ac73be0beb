"""Funnel analysis — ordered step completion per entity within a window.

The classic product-analytics query: which users performed step-1 then
step-2 then step-3, in order, with the whole chain inside a horizon?
Naive SQL is a k-way self-join (k shuffles of the events table). The
scale form used here is a single-pass window computation:

  for each step i, carry the earliest timestamp t_i such that
  t_1 <= t_2 <= ... <= t_i holds, as a running MIN over the entity's
  time-ordered events — one key shuffle total, any k.

``funnel_earliest`` returns per-entity earliest completion timestamps
per step (NULL where the prefix never completed); ``funnel_counts``
reduces to the per-step completion counts the dashboard wants.

Determinism: ties on ts break by event_id through the window ordering;
the completion condition uses <= (a later step may share the earlier
step's timestamp), mirrored exactly by the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_earliest(events: DataFrame, steps: list[str],
                    entity_col: str = "user_id",
                    ts_col: str = "ts",
                    type_col: str = "event_type",
                    horizon_s: float | None = None) -> DataFrame:
    """Per-entity earliest in-order completion time of each step prefix.

    Output: (entity, t_1, ..., t_k) with t_i = min ts of an in-order
    completion of steps[:i] (NULL if never). With ``horizon_s``, the
    whole chain must fit within that many seconds of t_1.
    """
    assert steps, "need at least one funnel step"
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.select(entity_col, "event_id", ts_col, type_col)
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        col = f"t_{i}"
        if prev is None:
            reached = F.when(
                F.col(type_col) == step, F.col(ts_col)
            )
        else:
            gate = F.col(prev).isNotNull() & (F.col(ts_col) >= F.col(prev))
            if horizon_s is not None:
                gate = gate & (
                    F.col(ts_col).cast("double")
                    <= F.col("t_1").cast("double") + float(horizon_s)
                )
            reached = F.when((F.col(type_col) == step) & gate, F.col(ts_col))
        # running earliest completion of the prefix
        df = df.withColumn(col, F.min(reached).over(w))
        prev = col
    out_cols = [f"t_{i}" for i in range(1, len(steps) + 1)]
    return df.groupBy(entity_col).agg(
        *[F.min(c).alias(c) for c in out_cols]
    )


def funnel_counts(events: DataFrame, steps: list[str],
                  entity_col: str = "user_id",
                  ts_col: str = "ts",
                  type_col: str = "event_type",
                  horizon_s: float | None = None) -> DataFrame:
    """Per-step completion counts (entities whose prefix completed)."""
    e = funnel_earliest(events, steps, entity_col, ts_col, type_col,
                        horizon_s)
    return e.select(
        *[
            F.count(f"t_{i}").cast("long").alias(f"n_step{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
