"""Distributed as-of (nearest-event) join.

Spark has no ASOF JOIN operator (DuckDB/kdb/pandas ``merge_asof`` do); the
naive emulation — an inequality range join + per-left-row argmax — explodes
to O(|left| x matching-window) rows before pruning. The scale-correct
composition is the tagged-union trick:

1. union left and right rows into one frame keyed (key, ts, src) where
   src orders the RIGHT row first at equal timestamps (so ts-equal matches
   are included, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``),
2. one window per key ordered by (ts, src): ``last(right_payload,
   ignorenulls=True)`` carries the most recent right row forward onto every
   later left row,
3. keep src=left rows.

Exactly ONE shuffle (the window partitioning on the key), row count
|left| + |right| throughout — no intermediate blowup, skew bounded by the
busiest key like any keyed window. ``direction="forward"`` reverses the
ordering (first right row at-or-after). ``tolerance`` nulls out matches
older (newer) than the given gap without changing the join shape.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Inner range join: pairs where ``right_ts`` falls inside
    ``[left_ts + lower, left_ts + upper]`` within the same ``on`` key.

    Spark plans a raw inequality join as BroadcastNestedLoopJoin (quadratic
    per key). The bucketed form is the standard fix: both sides bucket time
    by the window WIDTH (upper − lower), each left row's window spans at
    most TWO buckets (exploded, deduped), the join becomes an equi-join on
    (key, bucket) — shuffle-partitionable, AQE-skew-handleable — and the
    exact range predicate filters the ≤2× candidate inflation. Timestamps
    and bounds share one unit (e.g. nanos); ``upper > lower`` required.
    Returns all left columns + the matching right columns (right-side name
    collisions are the caller's to alias away beforehand).
    """
    if upper <= lower:
        raise ValueError(f"upper must exceed lower, got [{lower}, {upper}]")
    keys = list(on)
    width = upper - lower

    def bucket(x: Column) -> Column:
        # exact integer floor division (ADVICE r2): `/` on longs runs through
        # DOUBLE and rounds above 2^53, so nanosecond-epoch timestamps near a
        # bucket boundary could land one bucket off with an odd width. pmod
        # yields a non-negative remainder, making x - pmod(x, w) the exact
        # multiple-of-w floor for either sign; dividing that multiple in
        # DECIMAL (exact rational, result is an integer well inside the
        # 38-digit budget) has no rounding at all.
        xl = x.cast("long")
        adj = (xl - F.pmod(xl, F.lit(width))).cast("decimal(38,0)")
        return (adj / F.lit(width).cast("decimal(19,0)")).cast("long")

    lo = F.col(left_ts) + F.lit(lower)
    hi = F.col(left_ts) + F.lit(upper)
    lpart = left.withColumn(
        "__b", F.explode(F.array_distinct(F.array(bucket(lo), bucket(hi))))
    )
    rpart = right.withColumn("__b", bucket(F.col(right_ts)))
    cond = [lpart[k] == rpart[k] for k in keys] + [lpart["__b"] == rpart["__b"]]
    out_cols = (
        [lpart[k] for k in keys]
        + [lpart[c] for c in left.columns if c not in keys]
        + [rpart[c] for c in right.columns if c not in keys]
    )
    return (
        lpart.join(rpart, cond)
        .filter(
            (rpart[right_ts] >= lpart[left_ts] + F.lit(lower))
            & (rpart[right_ts] <= lpart[left_ts] + F.lit(upper))
        )
        .select(*out_cols)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (backward; ``forward`` = smallest >=) within
    the same ``on`` key. Unmatched left rows keep nulls (left-join
    semantics). Returns all left columns + ``right_cols`` (suffixed on name
    collisions) + ``{right_ts}{suffix}`` (the matched timestamp).

    Determinism contract: (key, right_ts) should uniquely identify a right
    row. If multiple right rows share a timestamp within a key, which one
    matches is partition-order-dependent — the same caveat pandas
    ``merge_asof`` has (it silently picks the last in input order).
    Pre-aggregate or dedupe the right side to restore a total order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    right_cols = list(right_cols)
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    def out_name(c: str) -> str:
        return f"{c}{suffix}" if c in left.columns else c

    rts_out = f"{right_ts}{suffix}" if right_ts in left.columns else right_ts
    rtype = dict(right.dtypes)

    # the right row travels as ONE struct, null exactly for left rows: a
    # per-column last(ignorenulls) would skip a matched right row's own NULL
    # column and backfill it from an OLDER right row, stitching together
    # columns of different right rows
    r_struct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    lpart = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    rpart = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c in left_payload],
        r_struct.alias("__r"),
    )
    both = lpart.unionByName(rpart)

    from pyspark.sql import Window

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__src").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__src").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        both.select(
            *keys, "__ts", "__src",
            *left_payload,
            F.last("__r", ignorenulls=True).over(w).alias("__m"),
        )
        .filter(F.col("__src") == 1)
        .select(
            *keys, "__ts", *left_payload,
            *[F.col(f"__m.__r_{c}").alias(f"__m_{c}") for c in right_cols],
            F.col("__m.__rts").alias("__mts"),
        )
    )

    matched_ts = F.col("__mts")
    if tolerance is not None:
        gap = (
            F.col("__ts") - matched_ts
            if direction == "backward"
            else matched_ts - F.col("__ts")
        )
        in_tol = matched_ts.isNotNull() & (gap <= tolerance)
        sel_m = [
            F.when(in_tol, F.col(f"__m_{c}")).alias(out_name(c)) for c in right_cols
        ]
        sel_ts = F.when(in_tol, matched_ts).alias(rts_out)
    else:
        sel_m = [F.col(f"__m_{c}").alias(out_name(c)) for c in right_cols]
        sel_ts = matched_ts.alias(rts_out)

    return carried.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *left_payload,
        *sel_m,
        sel_ts,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    l_id: str,
    l_start: str,
    l_end: str,
    r_id: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    max_buckets_per_row: int = 4096,
) -> DataFrame:
    """Interval-OVERLAP join: pairs where the half-open intervals
    ``[l_start, l_end)`` and ``[r_start, r_end)`` intersect within the
    same ``on`` key — sessions × campaign windows, spans × incident
    windows, IP ranges × allocations. Completes the temporal-join family:
    :func:`asof_join` is nearest-point, :func:`range_join_bucketed` is
    point-in-window, this is interval × interval.

    Same banding discipline as the range join (a raw double-inequality
    join plans as BroadcastNestedLoopJoin): both sides explode to the
    fixed-width buckets their interval covers, the join becomes an
    equi-join on (key, bucket) — shuffle-partitionable, AQE-skew-
    handleable — pairs straddling several shared buckets are deduped on
    (l_id, r_id), and the exact overlap predicate
    ``l_start < r_end AND r_start < l_end`` prunes the band inflation.

    ``bucket_width`` trades candidate inflation against explode width:
    set it near the TYPICAL interval length. A row covering more than
    ``max_buckets_per_row`` buckets (a degenerate mega-interval — the
    classic skew bomb in interval joins) fails the job LOUDLY via
    ``assert_true`` rather than silently exploding the shuffle; split
    such outliers upstream or raise the width.

    Returns ``(<on...>, l_id, l_start, l_end, r_id, r_start, r_end)``.
    Ids must be unique per side (they drive the dedupe).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(on)
    W = int(bucket_width)

    def explode_buckets(df, start, end, ident, prefix):
        s, e = F.col(start).cast("bigint"), F.col(end).cast("bigint")
        msg = (
            f"interval_join: a {prefix}-side interval covers more than "
            f"{max_buckets_per_row} buckets; raise bucket_width or split "
            "the interval"
        )
        # the guard must gate the sequence ITSELF (a separate assert
        # column gives no evaluation-order guarantee — the explode of a
        # mega-interval would still run): the upper bound becomes
        # raise_error when the row is degenerate, so the job fails loudly
        # BEFORE any sequence materializes
        hi_guarded = F.expr(
            f"IF(((({end}) - 1) div {W}) - (({start}) div {W}) + 1 "
            f"<= {int(max_buckets_per_row)}, "
            f"(({end}) - 1) div {W}, "
            f"CAST(raise_error('{msg}') AS BIGINT))"
        )
        lo = F.expr(f"({start}) div {W}").cast("bigint")
        return df.filter(s < e).select(
            *keys,
            F.col(ident).alias(f"{prefix}_id"),
            s.alias(f"{prefix}_start"),
            e.alias(f"{prefix}_end"),
            F.explode(F.sequence(lo, hi_guarded.cast("bigint"))).alias(
                "__bucket"
            ),
        )

    lb = explode_buckets(left, l_start, l_end, l_id, "l")
    rb = explode_buckets(right, r_start, r_end, r_id, "r")
    return (
        lb.join(rb, [*keys, "__bucket"])
        .filter(
            (F.col("l_start") < F.col("r_end"))
            & (F.col("r_start") < F.col("l_end"))
        )
        .drop("__bucket")
        .distinct()
    )
