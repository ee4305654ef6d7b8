"""Scalable global ordering (``__pos__``) assignment.

``FlatFrame.from_df`` assigns ``__pos__`` with ``row_number()`` over an
unpartitioned window — fine for presentation-shaped frames (the pivot-output
sizes the engine's margin operators work on), but a single-task serialization
point if a caller ever lifts a high-cardinality frame (VERDICT r1 watch item).

:func:`scalable_pos` is the scale path: the classic two-phase global rank.

1. ``repartitionByRange(order)`` — partitions hold contiguous key ranges.
2. local ``row_number`` per partition (window PARTITIONED by
   ``spark_partition_id`` — no single-task stage), plus per-partition row
   counts; partition offsets are a cumulative sum over ``numPartitions``
   rows (bounded driver collect, one int per partition) broadcast back.

The partitioned frame is eagerly ``localCheckpoint``-ed between the counts
pass and the rank pass so both see identical partition contents: unlike
``persist`` (whose blocks can be evicted and then *recomputed* with a fresh
range-boundary sample, silently moving rows between partitions while the
collected offsets still describe the old layout — ADVICE r2), a checkpoint
truncates lineage, so a lost block fails the job loudly instead of returning
wrong positions. Output positions are exactly 1..n in ``order`` — identical
to the unpartitioned ``row_number`` whenever ``order`` is a total order (the
same determinism contract the window path has).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scalable_pos(
    df: DataFrame,
    order: Sequence[str | Column],
    out_col: str = "__pos__",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense global 1..n position over ``order`` without an
    unpartitioned window. Returns ``df`` + ``out_col`` (double)."""
    from pyspark.sql import Window

    order = list(order)
    part = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions
        else df.repartitionByRange(*order)
    )
    local = (
        part.withColumn("__pid__", F.spark_partition_id())
        .withColumn(
            "__lrn__",
            F.row_number().over(
                Window.partitionBy("__pid__").orderBy(*order)
            ),
        )
        # eager lineage cut: the collected offsets below are only valid for
        # THIS materialization of the range partitioning; see module docstring
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        local.groupBy("__pid__").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_map = F.create_map(
        *[F.lit(x) for pid, off in sorted(offsets.items()) for x in (pid, off)]
    )
    return local.withColumn(
        out_col,
        (F.col("__lrn__") + off_map[F.col("__pid__")]).cast("double"),
    ).drop("__pid__", "__lrn__")
