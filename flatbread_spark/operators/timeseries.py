"""Time-series regularization: per-key time spines and gap filling.

Event streams are irregular; downstream models (rate monitors, per-day
training-data freshness dashboards, feature stores) want one row per
(key, bucket) even when nothing happened. The composition:

1. bucket each observation to the grid (integer floor — exact, no libm),
2. aggregate per (key, bucket) — the only corpus-sized shuffle,
3. derive each key's [min_bucket, max_bucket] span from THAT aggregate
   (key-cardinality rows, not event rows), ``sequence()`` + ``explode``
   the spine — spine size is sum over keys of span/step, a number the
   caller controls via the step, never |events|,
4. left-join observations onto the spine (keyed equi-join) and optionally
   fill value gaps forward with ``last(..., ignorenulls=True)`` over the
   per-key ordered window.

Every shuffle is on the SAME key (bucketed aggregate, spine join, fill
window), so AQE coalesces them and skew is bounded by the busiest key —
identical skew profile to any per-key rollup. A malicious/buggy key span
(one key spanning years at 1 s step) inflates only that key's spine;
``max_buckets_per_key`` fails loudly instead of OOMing an executor.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketize(ts_col, step: int):
    """Exact integer floor of ``ts_col`` (long) to multiples of ``step``.
    pmod keeps the remainder non-negative, so negative epochs floor
    correctly too (same guard as asof.range_join_bucketed)."""
    x = F.col(ts_col).cast("long") if isinstance(ts_col, str) else ts_col
    return x - F.pmod(x, F.lit(int(step)))


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    step: int,
    agg_exprs: dict[str, Column],
    fill: Sequence[str] = (),
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Regularize ``df`` onto a per-key grid of width ``step`` (same unit
    as ``ts_col``, which must be integral — epoch ns/us/s or an ordinal).

    ``agg_exprs`` maps output column name → aggregate Column evaluated per
    (key, bucket) (e.g. ``{"n": F.count('*'), "v": F.sum('value')}``).
    Buckets with no observations appear with NULL aggregates; names listed
    in ``fill`` are then forward-filled from the key's most recent observed
    bucket (counts you'd rather see as 0 — leave out of ``fill`` and
    ``coalesce`` after).

    Returns ``*keys, bucket_start, <agg columns>`` — one row per key per
    grid step between that key's first and last observation (inclusive).
    """
    keys = list(keys)
    step = int(step)
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")

    obs = (
        df.withColumn("__b", bucketize(ts_col, step))
        .groupBy(*keys, "__b")
        .agg(*[c.alias(n) for n, c in agg_exprs.items()])
    )
    # span per key comes from the aggregate (key-cardinality input);
    # sequence() is inclusive on both ends, matching generate_series
    span = obs.groupBy(*keys).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    # guard INSIDE the sequence bound so Catalyst cannot prune it away:
    # a key whose span would explode the spine fails the job loudly
    n_buckets = (F.col("__hi") - F.col("__lo")) / F.lit(step) + F.lit(1)
    hi_guarded = F.when(
        n_buckets <= F.lit(max_buckets_per_key), F.col("__hi")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "gap_fill: key span exceeds max_buckets_per_key=%s",
                F.lit(str(max_buckets_per_key)),
            )
        )
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), hi_guarded, F.lit(step).cast("long"))
        ).alias("__b"),
    )
    out = spine.join(obs, keys + ["__b"], "left")
    if fill:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for name in fill:
            out = out.withColumn(name, F.last(name, ignorenulls=True).over(w))
    return out.withColumnRenamed("__b", "bucket_start")
