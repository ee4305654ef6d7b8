"""Streaming mix-drift monitor: per-window categorical TVD vs a reference.

The live sibling of ``operators/trend.tvd_drift``: as events stream in,
maintain per-window category counts (one streaming aggregation — Spark
allows exactly one, so the drift arithmetic itself runs in the DRAIN, the
same split ``streaming/topk.drain_final_summary`` uses), then score every
window's mix against a broadcast reference mix with the exact integer TVD
formula. An alert fires when a window's traffic composition stops looking
like the reference — the streaming ingest guard for "the crawler started
returning 90% errors".

State is bounded by (#windows in watermark horizon) × (#categories) —
the same envelope as the hourly rollup. Counts are exact BIGINTs, so the
drained result equals the batch answer on a bounded replay (the
stream_replay contract) and the whole pipeline is value-hash replayable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flatbread_spark.functions.eventtime import ensure_epoch_ns

HOUR_NS = 3_600_000_000_000


def stream_mix_counts(
    spark,
    source_dir: str,
    schema,
    ts_col: str = "ts",
    by: str = "event_type",
    bucket_ns: int = HOUR_NS,
) -> DataFrame:
    """Streaming per-(window, category) counts: readStream → epoch-ns
    bucket → one groupBy. Complete output mode pairs with a bounded
    replay (availableNow) or a memory sink for monitoring; counts are
    exact, so draining yields the batch answer."""
    sdf = spark.readStream.schema(schema).parquet(source_dir)
    sdf = ensure_epoch_ns(sdf, ts_col)
    return (
        sdf.withColumn(
            "bucket", F.expr(f"{ts_col} div {int(bucket_ns)}").cast("bigint")
        )
        .groupBy("bucket", F.col(by).alias("cat"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def drift_from_counts(
    counts: DataFrame,
    reference: DataFrame,
) -> DataFrame:
    """Score each window's category mix against ``reference``
    (``(cat, n)`` — e.g. the whole-corpus mix, or last week's) with the exact
    integer TVD: ``tvd_ppm = Σ_c |n_w(c)·R − r(c)·N_w| · 1e6 div
    (2·N_w·R)``. Pure batch count-table algebra over the drained
    ``(bucket, cat, n)`` table: the window×category grid covers the UNION
    of reference and window categories (mirroring the batch sibling
    ``operators/trend.tvd_drift``'s full-outer join) — categories missing
    from a window count as zeros AND categories absent from the reference
    still contribute their full window mass. The latter is exactly the
    "crawler starts returning 90% errors" scenario this monitor exists
    for: a reference-only grid would silently drop the novel category's
    mass and underreport drift by up to 2×.

    Returns ``(bucket, n_window, tvd_ppm)`` — one row per window.
    """
    ref = reference.select(
        F.col("cat"), F.col("n").cast("bigint").alias("rn")
    )
    rtot = ref.agg(F.sum("rn").cast("bigint").alias("R"))
    wtot = counts.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("n_window")
    )
    # fresh exprIds on the counts side: wtot derives from the SAME relation
    # (a memory-sink view in the drain path), and a USING-join of a relation
    # with its own aggregate trips conflicting-attribute resolution
    cts = counts.select(
        F.col("bucket").alias("__b"),
        F.col("cat").alias("__c"),
        F.col("n").cast("bigint").alias("n"),
    )
    # reference block: every window × every reference category, zero-filled
    ref_grid = (
        wtot.crossJoin(F.broadcast(ref))
        .join(
            cts,
            (F.col("bucket") == F.col("__b")) & (F.col("cat") == F.col("__c")),
            "left",
        )
        .select(
            "bucket", "cat", "rn", "n_window",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )
    )
    # novel block: window categories with NO reference row (rn = 0) — a
    # broadcast anti-join against the tiny reference, then the per-window
    # total reattached (wtot is bounded by the watermark horizon)
    novel = (
        cts.join(F.broadcast(ref), cts["__c"] == ref["cat"], "left_anti")
        .join(wtot, F.col("__b") == F.col("bucket"), "inner")
        .select(
            "bucket",
            F.col("__c").alias("cat"),
            F.lit(0).cast("bigint").alias("rn"),
            "n_window",
            "n",
        )
    )
    grid = ref_grid.unionByName(novel)
    dec = "decimal(38,0)"
    gap = F.expr(
        f"abs(CAST(n AS {dec}) * CAST(R AS {dec}) "
        f"- CAST(rn AS {dec}) * CAST(n_window AS {dec}))"
    )
    return (
        grid.crossJoin(F.broadcast(rtot))
        .withColumn("__gap", gap)
        .groupBy("bucket")
        .agg(
            F.max("n_window").alias("n_window"),
            F.max("R").alias("__R"),
            F.sum("__gap").alias("__G"),
        )
        .select(
            "bucket",
            "n_window",
            F.expr(
                f"CAST(__G * 1000000 div (CAST(2 AS {dec}) "
                f"* CAST(n_window AS {dec}) * CAST(__R AS {dec})) AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )
