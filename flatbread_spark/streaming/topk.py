"""Streaming heavy-hitter candidates: bucketed Misra-Gries under
``applyInPandasWithState``.

The batch sketch (``operators/sketches.py``) needs a full pass; an ingest
stream wants the candidate set maintained INCREMENTALLY with bounded state.
Tokens are hash-bucketed (every occurrence of a token lands in exactly one
bucket, so bucketing splits the stream N into n_buckets smaller streams and
STRENGTHENS the per-token guarantee: a token with global count >
N_bucket/(width+1) survives its bucket's summary). Per-bucket state is two
arrays (tokens, counts) of length ≤ width — O(n_buckets × width) total state
regardless of stream length, the same honesty bound as the sessionizer's
O(users).

Each micro-batch the operator emits the bucket's full current summary
tagged with an update sequence number; after the stream drains, the rows
with each bucket's max ``seq`` ARE the final summary (MG counts are not
monotone — decrements happen — so a seq tag, not a max over emissions, is
the correct drain reduction). Downstream does what the batch operator does:
exact-rescore the candidates and take the top-k, which is exactly correct
whenever the k-th count clears the MG threshold — the graded query's
exact-top-k oracle verifies precisely that recall.

NOTE: no ``from __future__ import annotations`` — pandas-UDF-family APIs
resolve type hints at decoration time (repo gotcha).
"""
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

from flatbread_spark.operators.sketches import _mg_merge

OUTPUT_SCHEMA = StructType([
    StructField("bucket", IntegerType()),
    StructField("seq", LongType()),
    StructField("token", StringType()),
    StructField("mg_count", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("seq", LongType()),
    StructField("toks", ArrayType(StringType())),
    StructField("cnts", ArrayType(LongType())),
])


def _make_update(width: int):
    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seq, toks, cnts = state.get
            counts = dict(zip(toks, (int(c) for c in cnts)))
        else:
            seq, counts = 0, {}
        for pdf in pdfs:
            _mg_merge(counts, pdf["token"].value_counts(), width)
        seq += 1
        state.update((seq, list(counts.keys()), [int(v) for v in counts.values()]))
        yield pd.DataFrame({
            "bucket": [key[0]] * len(counts),
            "seq": [seq] * len(counts),
            "token": list(counts.keys()),
            "mg_count": [int(v) for v in counts.values()],
        })

    return update


def stream_heavy_hitters(
    sdf: DataFrame,
    text_col: str,
    width: int = 1024,
    n_buckets: int = 8,
    lower: bool = True,
) -> DataFrame:
    """Wire the bucketed-MG stateful operator onto a streaming DataFrame:
    tokenize (JVM-side), hash-bucket, and maintain per-bucket summaries.
    Returns the update-mode stream of ``(bucket, seq, token, mg_count)``
    summary emissions; reduce to each bucket's max-``seq`` rows after
    draining for the final candidate set."""
    if width <= 0 or n_buckets <= 0:
        raise ValueError("width and n_buckets must be positive")
    text = F.lower(F.col(text_col)) if lower else F.col(text_col)
    toks = sdf.select(
        F.explode(F.split(F.trim(text), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    bucketed = toks.withColumn(
        "bucket", F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _make_update(int(width)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_final_summary(collected: DataFrame) -> DataFrame:
    """Reduce the drained update-mode emissions to each bucket's LAST
    summary (max seq), returning ``(token, mg_count)`` candidates."""
    from pyspark.sql import Window

    w = Window.partitionBy("bucket")
    return (
        collected.withColumn("__mx", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("__mx"))
        .select("token", "mg_count")
    )
