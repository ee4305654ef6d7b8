"""Streaming latest-wins upsert: keyed current-state maintenance.

The batch primitive (``operators/versioning.merge_upsert``) folds a delta
into a snapshot once; a change-data stream wants the SAME latest-wins
contract maintained continuously — "what is the current row for every key
right now?" — with bounded state. This is the streaming half of corpus
versioning: per key the state is ONE (version, tiebreak, payload, deleted)
tuple, total state O(distinct keys) regardless of stream length (the same
honesty bound as the sessionizer's O(users)).

Winner rule matches the batch operator: highest ``version`` wins; ties
break on the ``tiebreak`` column (callers pass a unique id — the batch
operator's src-wins rule has no meaning in a single totally-ordered
stream). The winning (version, tiebreak) pair is monotone non-decreasing
per key across micro-batches and the fold is commutative — max over
pairs — so the drained answer is independent of how the source chops the
stream into batches. A ``deleted`` tombstone keeps the key's state (it
must keep winning against late lower-version rows) but marks it dropped;
``drain_current_state`` filters tombstones after the stream ends.

NOTE: no ``from __future__ import annotations`` — pandas-UDF-family APIs
resolve type hints at decoration time (repo gotcha).
"""
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("seq", LongType()),
    StructField("version", LongType()),
    StructField("tiebreak", LongType()),
    StructField("value", DoubleType()),
    StructField("deleted", BooleanType()),
])

STATE_SCHEMA = StructType([
    StructField("seq", LongType()),
    StructField("version", LongType()),
    StructField("tiebreak", LongType()),
    StructField("value", DoubleType()),
    StructField("deleted", BooleanType()),
])


def _update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        seq, ver, tie, val, dele = state.get
        best = (int(ver), int(tie), float(val), bool(dele))
    else:
        seq, best = 0, None
    for pdf in pdfs:
        for ver, tie, val, dele in zip(
            pdf["version"], pdf["tiebreak"], pdf["value"], pdf["deleted"]
        ):
            cand = (int(ver), int(tie), float(val), bool(dele))
            if best is None or cand[:2] > best[:2]:
                best = cand
    seq += 1
    state.update((seq, best[0], best[1], best[2], best[3]))
    yield pd.DataFrame({
        "k": [key[0]],
        "seq": [seq],
        "version": [best[0]],
        "tiebreak": [best[1]],
        "value": [best[2]],
        "deleted": [best[3]],
    })


def stream_latest_state(
    sdf: DataFrame,
    key_col: str,
    version_col: str,
    tiebreak_col: str,
    value_col: str,
    deleted_col=None,
) -> DataFrame:
    """Wire the latest-wins state operator onto a streaming change
    DataFrame. Emits each key's current winner once per micro-batch that
    touches it, tagged with an update ``seq``; reduce with
    :func:`drain_current_state` after draining. ``deleted_col`` may be a
    column name or None (no tombstones)."""
    dele = (
        F.coalesce(F.col(deleted_col), F.lit(False))
        if deleted_col is not None
        else F.lit(False)
    )
    rows = sdf.select(
        F.col(key_col).cast("long").alias("k"),
        F.col(version_col).cast("long").alias("version"),
        F.col(tiebreak_col).cast("long").alias("tiebreak"),
        F.col(value_col).cast("double").alias("value"),
        dele.alias("deleted"),
    )
    return rows.groupBy("k").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_current_state(collected: DataFrame) -> DataFrame:
    """Reduce drained update-mode emissions to each key's LAST state (max
    seq) and drop tombstoned keys: ``(k, version, value)`` — the streaming
    answer that must equal the batch ``merge_upsert`` over the same
    changes."""
    from pyspark.sql import Window

    w = Window.partitionBy("k")
    return (
        collected.withColumn("__mx", F.max("seq").over(w))
        .filter((F.col("seq") == F.col("__mx")) & ~F.col("deleted"))
        .select("k", "version", "value")
    )
