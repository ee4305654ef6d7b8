"""Event-time windowed aggregation and sessionization.

The reference has no streaming surface (SURVEY §2.8); these are the engine's
additive stream operators, written so the SAME transformation body runs in
batch (testable against a SQL oracle) and under Structured Streaming
(``readStream`` + watermark).

Operators are dtype-polymorphic on the event-time column: whatever parquet
delivered (BIGINT ns via nanosAsLong, TIMESTAMP, or TIMESTAMP_NTZ on
pyspark 4.x) is normalized to BIGINT epoch-nanoseconds at entry
(``functions.eventtime.ensure_epoch_ns``), then bucketed arithmetically —
no timezone ambiguity, identical in SQL (``epoch_ns``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flatbread_spark.functions.eventtime import ensure_epoch_ns

_NS = 1_000_000_000


def hourly_rollup(events: DataFrame, ts_ns: str = "ts", by: str = "event_type") -> DataFrame:
    """Tumbling 1-hour window counts + exact value sums per group.

    Batch form of ``readStream → withWatermark → groupBy(window(...))``; the
    bucket is epoch-aligned like ``F.window`` with a 1h slide.
    Returns (bucket_start epoch-sec, <by>, n_events, sum_value).
    """
    events = ensure_epoch_ns(events, ts_ns)
    bucket = (F.floor(F.col(ts_ns) / F.lit(3600 * _NS)) * 3600).cast("bigint")
    return (
        events.groupBy(bucket.alias("bucket_start"), F.col(by))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("sum_value"),
        )
    )


def sessionize(
    events: DataFrame,
    ts_ns: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session stats with an inactivity-gap session definition.

    A new session starts when the gap to the previous event exceeds
    ``gap_minutes``. One shuffle (partition by user); the lag window runs
    within user partitions — no global ordering.
    Returns (user_id, n_sessions, n_events, max_session_events).
    """
    events = ensure_epoch_ns(events, ts_ns)
    gap_ns = gap_minutes * 60 * _NS
    w = Window.partitionBy(user_col).orderBy(F.col(ts_ns), "event_id")
    flagged = events.withColumn(
        "__new_session",
        F.when(
            (F.col(ts_ns) - F.lag(ts_ns).over(w)) > gap_ns, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = flagged.groupBy(user_col, "__session_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("__n").alias("n_events"),
        F.max("__n").alias("max_session_events"),
    )


def stream_hourly_rollup(spark, source_path: str, schema, by: str = "event_type"):
    """Structured Streaming wiring for ``hourly_rollup``: file source →
    watermark → windowed aggregate. Returns the streaming DataFrame (caller
    attaches ``writeStream``). ``schema`` must be the FILE schema (whatever
    dtype the parquet carries); the stream normalizes to epoch-ns right after
    the source, then derives a real TIMESTAMP column for watermarking."""
    stream = ensure_epoch_ns(
        spark.readStream.schema(schema).parquet(source_path), "ts"
    )
    with_ts = stream.withColumn(
        "__event_time", F.timestamp_seconds(F.col("ts") / F.lit(_NS))
    ).withWatermark("__event_time", "2 hours")
    return (
        with_ts.groupBy(F.window("__event_time", "1 hour"), F.col(by))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            by, "n_events", "sum_value",
        )
    )
