"""Exact per-group discrete quantiles — no per-group sort, no approx.

approx_percentile trades accuracy for a sketch; a window-sort per group
holds whole groups in task memory. For discrete-domain measures (token
counts, byte sizes, durations in integer units) the exact answer is a
histogram problem: count per (group, value) — output bounded by the
value DOMAIN per group, not the row count — cumulate along the value
order within each group (windows PARTITIONED by group, so they
distribute), and pick the smallest value whose cumulative count reaches
ceil(q·N). All integer arithmetic: quantile targets are passed as exact
fractions, so both engines compute the identical element.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_quantiles(df: DataFrame, group_col: str, value_col: str,
                      quantiles: list[tuple[int, int, str]]) -> DataFrame:
    """One row per group: n_rows plus each requested discrete quantile.

    ``quantiles`` is a list of (numerator, denominator, out_name);
    quantile element = smallest v with cum_count >= ceil(num·N / den)
    (the type-1 discrete quantile — q=(1,2) is the lower median).
    """
    from pyspark.sql import Window

    assert quantiles
    counts = df.groupBy(group_col, value_col).agg(
        F.count("*").alias("_n"))
    # the running count and the group total share one partitioning — two
    # Window ops over the same exchange, no self-join (which would also
    # trip Spark's ambiguous-attribute dedup on the shared lineage)
    w = Window.partitionBy(group_col).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(group_col)
    joined = counts.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "_N", F.sum("_n").over(w_all))
    aggs = [F.max("_N").cast("long").alias("n_rows")]
    for num, den, name in quantiles:
        target = f"(({int(num)} * _N + {int(den) - 1}) div {int(den)})"
        aggs.append(
            F.min(
                F.when(F.expr(f"_cum >= {target}"), F.col(value_col))
            ).alias(name)
        )
    return joined.groupBy(group_col).agg(*aggs)


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: int = 3) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation
    — the data-quality monitor's workhorse (mean/stddev break down on
    the very outliers being hunted; medians don't).

    Integer-exact by construction: the type-1 discrete median of
    `grouped_quantiles` is an actual data value (no interpolation — the
    float quantile of most engines is un-gateable), so the deviations
    ``|v - med|`` are exact integers and so is the MAD. A value is an
    outlier when ``dev > k * mad`` (k=3 ~ the classic 2-sigma-ish
    cutoff for normal-ish data). Output: (group, n_rows, med, mad,
    n_outliers).

    Plan: two `grouped_quantiles` passes (each one group-keyed exchange
    + two windows over it) and two equi-joins back on the group key —
    the per-group state the windows sort is the DISTINCT value domain,
    not the row count, and AQE broadcasts the tiny per-group median/MAD
    tables onto the row stream."""
    med = grouped_quantiles(
        df, group_col, value_col, [(1, 2, "med")]).select(group_col, "med")
    dev = df.join(med, group_col).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("med")))
    mad = grouped_quantiles(dev, group_col, "_dev", [(1, 2, "mad")]).select(
        group_col, "mad")
    return (
        dev.join(mad, group_col)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.max("med").cast("long").alias("med"),
            F.max("mad").cast("long").alias("mad"),
            F.sum(
                F.when(F.col("_dev") > k * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )
