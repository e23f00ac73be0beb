"""Cohort retention — the activity-over-time matrix behind every
engagement dashboard.

cohort(user) = the week of the user's first activity; retention(c, k) =
how many of cohort c's users were active in week c+k. Two aggregations:

  1. per (user, week) distinct activity  — one (user, week) shuffle,
     map-side combinable;
  2. first-week window min per user, broadcast back onto the activity
     rows (AQE broadcasts the per-user cohort table when it fits; at
     10^9 users it degrades to a user-key shuffle join), then a
     (cohort_week, k) count distinct.

Weeks are integer epoch-week buckets (floor(epoch_s / 604800)) — exact
BIGINT arithmetic, portable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WEEK_S = 7 * 24 * 3600


def cohort_retention(events: DataFrame, entity_col: str = "user_id",
                     ts_col: str = "ts", max_k: int | None = None) -> DataFrame:
    """(cohort_week, k, n_users): users of cohort_week active k weeks on.

    k = 0 rows give cohort sizes (every user is active in their first
    week by construction).
    """
    weeks = events.select(
        F.col(entity_col).alias("entity"),
        F.floor(F.unix_timestamp(ts_col) / WEEK_S).cast("long").alias("week"),
    ).distinct()
    first = weeks.groupBy("entity").agg(F.min("week").alias("cohort_week"))
    joined = weeks.join(first, "entity").select(
        "entity", "cohort_week",
        (F.col("week") - F.col("cohort_week")).alias("k"),
    )
    if max_k is not None:
        joined = joined.where(F.col("k") <= int(max_k))
    return joined.groupBy("cohort_week", "k").agg(
        F.count("*").cast("long").alias("n_users")
    )


def markov_transitions(events_df: DataFrame,
                       entity_col: str = "user_id",
                       state_col: str = "event_type",
                       ts_col: str = "ts",
                       tie_col: str = "event_id") -> DataFrame:
    """First-order Markov transition counts over per-entity event
    streams — the behavioral-analytics rollup ("after a click, what
    happens next?") and the `od_matrix` shape applied to states instead
    of zones.

    Consecutive events of the same entity (ordered by timestamp, ties
    broken by the id column — a total, cross-engine-deterministic
    order) emit one (from_state, to_state) observation, self-loops
    INCLUDED (state persistence is signal here, unlike zone stays).
    ``from_total`` repeats the from-state's total outgoing count on
    every row, so a caller gets the exact transition probability
    num/den pair without a second query. Output: (from_state,
    to_state, n_transitions, from_total).

    Plan: one entity-key exchange + lag window (spillable per-partition
    sort), a map-side-combined groupBy on the state pair (bounded by
    |states|^2), then a window-free broadcast-sized self-agg join for
    the totals."""
    from pyspark.sql import Window

    w = Window.partitionBy(entity_col).orderBy(ts_col, tie_col)
    t = (
        events_df.select(entity_col, ts_col, tie_col,
                         F.col(state_col).alias("to_state"))
        .withColumn("from_state", F.lag("to_state").over(w))
        .filter(F.col("from_state").isNotNull())
    )
    pairs = t.groupBy("from_state", "to_state").agg(
        F.count("*").cast("long").alias("n_transitions"))
    totals = pairs.groupBy("from_state").agg(
        F.sum("n_transitions").cast("long").alias("from_total"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state", "to_state", "n_transitions", "from_total")
