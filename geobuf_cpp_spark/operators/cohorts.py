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
