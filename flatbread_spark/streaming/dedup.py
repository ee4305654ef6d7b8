"""Streaming deduplication for continuous corpus ingest.

Batch dedup (``operators.dedup``) assumes the corpus is at rest; an ingest
pipeline sees documents arrive continuously and must drop repeats ON THE WAY
IN without unbounded state. Structured Streaming's
``dropDuplicatesWithinWatermark`` is exactly that operator: state is keyed by
the content fingerprint and evicted once the watermark passes the event time,
so memory is bounded by (arrival rate × watermark delay), not corpus size —
the only sound configuration for an unbounded stream. Cite: reference has no
streaming surface (SURVEY §2.8); this is a beyond-reference pipeline op.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    stream_df: DataFrame,
    content_col: str,
    ts_col: str,
    delay: str = "1 hour",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Exact-content streaming dedup: first arrival of each fingerprint
    within the watermark window survives.

    The fingerprint (md5 of content) is computed BEFORE the stateful
    operator so dedup state stores 32 bytes per key, never the document
    itself. Duplicates arriving later than ``delay`` after the original are
    re-emitted — that is the documented watermark trade-off; size ``delay``
    to the ingest pipeline's reorder bound and run a periodic batch
    ``dedup_exact`` sweep for the long tail."""
    return (
        stream_df.withColumn(fingerprint_col, F.md5(F.col(content_col)))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark([fingerprint_col])
    )
