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


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov distance between the
    distributions of an integral metric in two frames (two corpus
    snapshots, two sources, train vs eval) — the standard drift alarm:
    ``D = max_v |CDF_a(v) - CDF_b(v)|``. Run it on document lengths or
    quality scores after every ingestion change; a D_ppm jump says the
    new crawl is a different animal before any model notices.

    Exact integer formulation: at each distinct value the unnormalized
    gap is ``|cum_a·n_b − cum_b·n_a|`` (cross-multiplied CDFs — no
    division until the very end), maximized, then reported as
    ``d_ppm = D·1e6 div (n_a·n_b)`` with the products on DECIMAL(38,0).
    ``ks_at`` is the smallest value attaining the max, making the whole
    row deterministic. Byte-identical replay, no floats anywhere.

    Scale shape: each side collapses to (value, count) — bounded by the
    DISTINCT VALUES of the metric, not row count — then one full outer
    join and one ordered window over that value-domain table. Integral
    metrics (lengths, scores in ppm, bucket ids) have compact domains;
    for a continuous metric, bucketize first (``quantile_bucketize``) —
    the window is the only ordered pass and runs over the domain table.

    Returns one row: ``(n_a, n_b, d_ppm, ks_at)``.
    """
    from pyspark.sql import Window

    a = (
        df_a.select(F.col(value_col).cast("bigint").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
    )
    b = (
        df_b.select(F.col(value_col).cast("bigint").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    )
    m = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    cums = m.select(
        "v",
        F.sum("ca").over(w).cast("bigint").alias("cum_a"),
        F.sum("cb").over(w).cast("bigint").alias("cum_b"),
    ).localCheckpoint(eager=False)
    # 2-number action against the checkpointed cumulatives (the
    # weighted_percentiles discipline): totals are the final cumsums.
    # Lazy checkpoint: this full-scan aggregate doubles as the
    # materializing action (one job, not two — SCALE.md round-11)
    trow = cums.agg(
        F.max("cum_a").alias("na"), F.max("cum_b").alias("nb")
    ).collect()[0]
    n_a, n_b = int(trow["na"] or 0), int(trow["nb"] or 0)
    if n_a == 0 or n_b == 0:
        raise ValueError("ks_drift requires non-empty frames on both sides")
    gap = F.expr(
        f"abs(CAST(cum_a AS {dec}) * CAST({n_b} AS {dec}) "
        f"- CAST(cum_b AS {dec}) * CAST({n_a} AS {dec}))"
    )
    return (
        cums.withColumn("__gap", gap)
        .orderBy(F.col("__gap").desc(), F.col("v"))
        .limit(1)
        .select(
            F.lit(n_a).cast("bigint").alias("n_a"),
            F.lit(n_b).cast("bigint").alias("n_b"),
            F.expr(
                f"CAST(__gap * 1000000 div (CAST({n_a} AS {dec}) "
                f"* CAST({n_b} AS {dec})) AS BIGINT)"
            ).alias("d_ppm"),
            F.col("v").alias("ks_at"),
        )
    )


def tvd_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    cat_col: str,
) -> DataFrame:
    """EXACT total-variation distance between two CATEGORICAL
    distributions — the drift alarm for lang/source/label mixes, the
    discrete companion to :func:`ks_drift` (which needs an ordered
    metric): ``TVD = ½ Σ_c |p_a(c) − p_b(c)|``, 0 = identical mix,
    1e6 ppm = disjoint support.

    Integer formulation: per category the cross-multiplied gap
    ``|n_a(c)·N_b − n_b(c)·N_a|`` on DECIMAL(38,0), summed, then ONE
    integral division ``div (2·N_a·N_b)`` — byte-identical replay.
    Per-category shares are also emitted by the companion breakdown in
    the caller if needed; this returns the headline row.

    Scale shape: two partial-aggregated groupBys bounded by the category
    vocabulary, one full outer join on the category, one 2-number driver
    action for the totals (the ks_drift discipline), and a
    vocabulary-bounded abs-gap sum. No window at all.

    Returns one row: ``(n_a, n_b, n_cats, tvd_ppm)``.
    """
    a = (
        df_a.select(F.col(cat_col).cast("string").alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
    )
    b = (
        df_b.select(F.col(cat_col).cast("string").alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    )
    m = (
        a.join(b, "c", "full_outer")
        .select(
            "c",
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
        )
        # lazy: the full-scan totals aggregate right below materializes it
        .localCheckpoint(eager=False)
    )
    trow = m.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("nc"),
    ).collect()[0]
    n_a, n_b, n_cats = int(trow["na"] or 0), int(trow["nb"] or 0), int(trow["nc"])
    if n_a == 0 or n_b == 0:
        raise ValueError("tvd_drift requires non-empty frames on both sides")
    dec = "decimal(38,0)"
    gap = F.expr(
        f"abs(CAST(ca AS {dec}) * CAST({n_b} AS {dec}) "
        f"- CAST(cb AS {dec}) * CAST({n_a} AS {dec}))"
    )
    return (
        m.withColumn("__gap", gap)
        .agg(F.sum("__gap").alias("__G"))
        .select(
            F.lit(n_a).cast("bigint").alias("n_a"),
            F.lit(n_b).cast("bigint").alias("n_b"),
            F.lit(n_cats).cast("bigint").alias("n_cats"),
            F.expr(
                f"CAST(__G * 1000000 div (CAST(2 AS {dec}) "
                f"* CAST({n_a} AS {dec}) * CAST({n_b} AS {dec})) AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )


def rolling_median(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    k: int,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Trailing ``k``-row EXACT nearest-rank median per key — the robust
    smoother for bucketized series (the windowed companion to
    :func:`theil_sen`): a burst day barely moves the rolling median where
    it drags a rolling mean, so ``value - rolling_median`` is the
    residual to alarm on. ``order_col`` must be a total order within the
    key (bucket ordinal).

    Frame rows are collected, sorted, and indexed at ``ceil(n/2)`` (the
    lower middle for even n — matching DuckDB's ``quantile_disc(0.5)``,
    so the result replays exactly; no averaging, the answer always EXISTS
    in the data). The collected frame is bounded by ``k`` — a few dozen
    for any real smoothing window — making the per-row cost O(k log k)
    row-locally with zero extra shuffles beyond the per-key window.
    """
    if k < 1:
        raise ValueError("rolling_median requires k >= 1")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col))
        .rowsBetween(-(int(k) - 1), 0)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    n = F.size(arr)
    mid = F.ceil(n / F.lit(2.0)).cast("int")
    return df.withColumn(out_col, F.element_at(arr, mid))
