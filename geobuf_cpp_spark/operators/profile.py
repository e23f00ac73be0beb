"""Table profiling — the ANALYZE/statistics pass, single-scan.

Per requested column: row count, null count, exact distinct count, and
min/max (stringified; callers profile numeric extremes on integer or
string columns so the cross-engine formatting is identity). All columns
profile in ONE scan: Catalyst plans the multi-column count-distincts as
a single Expand over the scan, and the wide 1-row aggregate is unpivoted
to long form with ``stack`` — no per-column re-reads, which at 100 TB is
the difference between one corpus pass and one per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n, n_null, n_distinct, min_s, max_s) per column."""
    aggs = []
    for i, c in enumerate(cols):
        aggs.extend([
            F.count(c).cast("long").alias(f"_n{i}"),
            F.sum(F.col(c).isNull().cast("int")).cast("long")
            .alias(f"_z{i}"),
            F.countDistinct(c).cast("long").alias(f"_d{i}"),
            # min/max in the column's native order, stringified AFTER —
            # int/string stringification is identical across engines
            # (doubles are not; profile those via integer twins)
            F.min(c).cast("string").alias(f"_mn{i}"),
            F.max(c).cast("string").alias(f"_mx{i}"),
        ])
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', _n{i}, _z{i}, _d{i}, _mn{i}, _mx{i}"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, n, n_null, n_distinct, min_s, max_s)"
    )
