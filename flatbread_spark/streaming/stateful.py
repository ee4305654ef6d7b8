"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

The batch ``sessionize`` (windows.py) needs the whole history per user; a
stream can't re-shuffle history every micro-batch. Here per-user state
carries (last_ts, n_sessions, n_events, cur_len, max_len) and each
micro-batch folds its (kernel-sorted) events into that state — O(batch)
work, O(users) state, no growing shuffle. Timeout-free: session closure is
decided by the gap rule alone, so results match the batch operator exactly
once the stream drains (verified in tests/test_streaming.py).

NOTE: no ``from __future__ import annotations`` — pandas-UDF-family APIs
resolve type hints at decoration time.
"""
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flatbread_spark.functions.eventtime import ensure_epoch_ns
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

_NS = 1_000_000_000

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
    StructField("max_session_events", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("last_ts", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
    StructField("cur_len", LongType()),
    StructField("max_len", LongType()),
])


def _make_update(gap_ns: int):
    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events, cur_len, max_len = state.get
        else:
            last_ts, n_sessions, n_events, cur_len, max_len = None, 0, 0, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"].astype("int64"):
                if last_ts is None or ts - last_ts > gap_ns:
                    n_sessions += 1
                    cur_len = 0
                cur_len += 1
                n_events += 1
                max_len = max(max_len, cur_len)
                last_ts = int(ts)
        state.update((last_ts, n_sessions, n_events, cur_len, max_len))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "max_session_events": [max_len],
            }
        )

    return update


def stream_sessionize(
    spark,
    source_path: str,
    schema,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File stream → per-user stateful session stats (update mode).

    Returns the streaming DataFrame; caller attaches ``writeStream``. Each
    micro-batch emits the refreshed totals for users seen in that batch.
    ``schema`` must be the FILE schema; the kernel's int64-ns contract is
    restored by normalizing right after the source.

    ``max_files_per_trigger`` rate-limits the drain to that many files per
    micro-batch (availableNow honors it), exercising the cross-batch state
    carry instead of folding everything in one batch. Batch-operator
    equality then requires per-user TIME-ORDERED batches (the normal
    daily-ingest shape): a late event arriving in a later batch than a
    newer one computes a negative gap and merges into the CURRENT session,
    where the batch sort might have split differently — the same
    first-wins caveat every O(users)-state sessionizer carries."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = ensure_epoch_ns(reader.parquet(source_path), "ts")
    return (
        stream.groupBy(F.col(user_col))
        .applyInPandasWithState(
            _make_update(gap_minutes * 60 * _NS),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
