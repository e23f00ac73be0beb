"""Bucketed tables: co-located joins with NO exchange on either side.

The brief's third join strategy (after broadcast and shuffle-hash): when
two big tables will be joined repeatedly on the same key — features and
their enrichments, signatures and assignments — write both bucketed by
that key. Spark's bucketing records the hash-partitioning in the catalog,
so a later equi-join needs no Exchange at all (verified by plan
inspection in tests): at 100 TB that deletes the single largest cost of a
repeated big-big join.

Buckets are also the unit of parallelism for the join: pick
``n_buckets`` ~ cluster cores x small multiple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket counts Catalyst plans a SortMergeJoin whose
    children read bucketed scans directly — zero Exchange operators
    (asserted in tests via the physical plan).
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains a SHUFFLE Exchange
    (hash/range repartitioning) — broadcast exchanges don't count; they
    move the small side only."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
