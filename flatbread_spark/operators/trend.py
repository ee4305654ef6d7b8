"""Robust per-group trend detection: exact Theil–Sen median slope.

"Is this source's daily volume trending down? Is average document quality
drifting?" answered robustly — the Theil–Sen estimator (median of all
pairwise slopes) tolerates up to ~29% outlier points, where an OLS fit
chases a single burst day. The classic ingestion-health monitor to run
over the regularized series :func:`events.gap_fill` builds.

Exactness contract (repo-wide rule): slopes are integer parts-per-million
with TRUNCATING division — Spark's ``div`` and DuckDB's integer ``//``
both round toward zero (verified: ``-7 // 2 = -3`` in DuckDB, matching
``-7 div 2`` in Spark), so negative slopes need no floor emulation; both
engines produce the same BIGINT for every pair, and the median is the
nearest-rank element of that integer multiset: byte-identical replay, no
libm, no float argmin.

Scale shape: the pair join is per-group (x1 < x2 within the key) — the
input is a BUCKETIZED series (days, hours), so pairs-per-group is
(#buckets choose 2), bounded by the series length squared, never raw
event count. A year of daily buckets is ~66k pairs per key; the pair
relation is the only shuffle beyond the rank window.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group exact Theil–Sen trend: the nearest-rank MEDIAN of all
    pairwise integer slopes ``slope_ppm = trunc((y2-y1)·1e6 / (x2-x1))``
    over the group's (x, y) series. Returns
    ``(<group_col>, n_points, n_pairs, slope_ppm)`` — one row per group
    with at least 2 distinct x points; ppm units: +1_000_000 means y
    rises one unit per unit of x.

    ``x_col`` and ``y_col`` must be integral (bucket ordinals / counts —
    the :func:`events.gap_fill` output shape). Median position uses the
    all-BIGINT interval match ``pos == ceil(n/2)`` (the
    ``ranking.group_percentiles`` trick), so no division appears anywhere
    the engines could disagree.
    """
    from pyspark.sql import Window

    a = df.select(
        F.col(group_col).alias("__g"),
        F.col(x_col).cast("bigint").alias("x1"),
        F.col(y_col).cast("bigint").alias("y1"),
    )
    b = df.select(
        F.col(group_col).alias("__g"),
        F.col(x_col).cast("bigint").alias("x2"),
        F.col(y_col).cast("bigint").alias("y2"),
    )
    # truncating BIGINT division — the shared Spark `div` / DuckDB `//`
    # semantics (den > 0 by the x1 < x2 join condition)
    pairs = (
        a.join(b, "__g")
        .filter(F.col("x1") < F.col("x2"))
        .withColumn(
            "__s",
            F.expr(
                "((y2 - y1) * CAST(1000000 AS BIGINT)) div (x2 - x1)"
            ).cast("bigint"),
        )
    )
    wg = Window.partitionBy("__g")
    ranked = pairs.withColumn(
        "__pos",
        F.row_number()
        .over(wg.orderBy(F.col("__s"), F.col("x1"), F.col("x2")))
        .cast("bigint"),
    ).withColumn("__n", F.count(F.lit(1)).over(wg).cast("bigint"))
    # median: pos == ceil(n/2)  ⟺  2·(pos-1) < n ≤ 2·pos
    med = ranked.filter(
        ((F.col("__pos") - 1) * 2 < F.col("__n"))
        & (F.col("__n") <= F.col("__pos") * 2)
    )
    npoints = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(x_col).cast("bigint").alias("x"),
        )
        .distinct()
        .groupBy("__g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    )
    return (
        med.select(
            F.col("__g"),
            F.col("__n").alias("n_pairs"),
            F.col("__s").alias("slope_ppm"),
        )
        .join(F.broadcast(npoints), "__g")
        .select(
            F.col("__g").alias(group_col),
            "n_points", "n_pairs", "slope_ppm",
        )
    )
