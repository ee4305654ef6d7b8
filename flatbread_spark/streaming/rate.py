"""Streaming rate-spike detection: the streaming twin of
``operators/timeseries.rate_anomaly``.

A batch rate audit answers "where were the spikes"; the ingestion monitor
wants the same verdicts CONTINUOUSLY — flag a key the moment its current
bucket closes hot. Per key the state is (current open bucket, its running
count, the last ``trailing`` CLOSED bucket counts) — a fixed-width tuple,
total state O(distinct keys × trailing), independent of stream length
(the same honesty bound as the sessionizer and the upsert operator).

Grid semantics match the batch operator exactly: when a new bucket
arrives, every grid bucket between the previous open bucket and the new
one closes with count 0 first (silent buckets count as zero — the classic
rate-monitor false negative), then the previous bucket closes with its
real count. A bucket is EVALUATED at close time against the ``trailing``
buckets behind it, and only once full history exists; the final open
bucket of the stream never closes (no later evidence), mirroring the
batch output filtered to fully-historied buckets strictly before each
key's last observation. All comparisons are the same all-BIGINT
arithmetic as the batch operator, so a drained replay is byte-identical
to the batch answer.

Ordering contract: buckets must be non-decreasing per key ACROSS
micro-batches (within a batch the kernel sorts). A row for an
already-closed bucket is counted into ``n_late`` state and excluded from
verdicts — late data cannot silently rewrite a verdict that already
shipped downstream.

NOTE: no ``from __future__ import annotations`` — pandas-UDF-family APIs
resolve type hints at decoration time (repo gotcha).
"""
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("bucket_start", LongType()),
    StructField("n", LongType()),
    StructField("trailing_sum", LongType()),
    StructField("ratio_x1000", LongType()),
    StructField("is_anomaly", BooleanType()),
])

# hist is a comma-joined string of the last `trailing` closed counts —
# state schemas are least surprising with scalar fields, and the width is
# bounded by the trailing parameter
STATE_SCHEMA = StructType([
    StructField("last_bucket", LongType()),
    StructField("cur_n", LongType()),
    StructField("hist", StringType()),
    StructField("n_late", LongType()),
])


def make_rate_update(step: int, trailing: int, factor_x1000: int, min_count: int):
    """Build the keyed state-update kernel (parameters closed over)."""
    step = int(step)
    trailing = int(trailing)
    factor_x1000 = int(factor_x1000)
    min_count = int(min_count)

    def _update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_b, cur_n, hist_s, n_late = state.get
            hist = [int(x) for x in hist_s.split(",")] if hist_s else []
        else:
            last_b, cur_n, hist, n_late = None, 0, [], 0

        out = {c: [] for c in
               ("bucket_start", "n", "trailing_sum", "ratio_x1000",
                "is_anomaly")}

        def close(bucket: int, n: int) -> None:
            # evaluate THEN push — hist holds the buckets strictly before
            if len(hist) >= trailing:
                tsum = sum(hist[-trailing:])
                lhs = n * trailing * 1000
                flag = n >= min_count and (tsum == 0 or lhs > factor_x1000 * tsum)
                out["bucket_start"].append(bucket)
                out["n"].append(n)
                out["trailing_sum"].append(tsum)
                out["ratio_x1000"].append(lhs // tsum if tsum > 0 else None)
                out["is_anomaly"].append(flag)
            hist.append(n)
            del hist[:-trailing]

        # fold the batch into per-bucket counts, ascending
        counts = {}
        for pdf in pdfs:
            b = (pdf["ts"].astype("int64") // step) * step
            for bucket, n in b.value_counts().items():
                counts[int(bucket)] = counts.get(int(bucket), 0) + int(n)
        for bucket in sorted(counts):
            n = counts[bucket]
            if last_b is None:
                last_b, cur_n = bucket, n
            elif bucket == last_b:
                cur_n += n
            elif bucket < last_b:
                n_late += n  # closed bucket — never rewrite a verdict
            else:
                close(last_b, cur_n)
                for g in range(last_b + step, bucket, step):
                    close(g, 0)
                last_b, cur_n = bucket, n

        state.update((
            last_b if last_b is not None else -1,
            cur_n,
            ",".join(str(x) for x in hist),
            n_late,
        ))
        if out["bucket_start"]:
            yield pd.DataFrame({
                "k": [key[0]] * len(out["bucket_start"]),
                "bucket_start": out["bucket_start"],
                "n": out["n"],
                "trailing_sum": out["trailing_sum"],
                "ratio_x1000": pd.array(out["ratio_x1000"], dtype="Int64"),
                "is_anomaly": out["is_anomaly"],
            })

    return _update


def stream_rate_anomaly(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    step: int,
    trailing: int = 4,
    factor_x1000: int = 3000,
    min_count: int = 4,
) -> DataFrame:
    """Wire the rate monitor onto a streaming DataFrame whose ``ts_col``
    is integral (epoch ns/us/s — normalize with
    ``functions.eventtime.ensure_epoch_ns`` at the load boundary). Emits
    one row per closed, fully-historied grid bucket; a drained replay
    equals the batch :func:`~flatbread_spark.operators.timeseries.rate_anomaly`
    filtered to the same rows."""
    rows = sdf.select(
        F.col(key_col).cast("long").alias("k"),
        F.col(ts_col).cast("long").alias("ts"),
    )
    return rows.groupBy("k").applyInPandasWithState(
        make_rate_update(step, trailing, factor_x1000, min_count),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
