"""Sliding-window document chunking for RAG / embedding pipelines.

Retrieval and embedding stacks consume fixed-size overlapping chunks, not
whole documents. This operator turns each document row into its window
sequence — ``window_words`` tokens per chunk, advancing ``stride_words``
(< window ⇒ overlap) — entirely with row-local array expressions:
``split`` → ``sequence``/``posexplode`` → ``slice`` → ``concat_ws``.

Scale: ZERO shuffle. Chunking is a per-row transform (the explode is
map-side), so the plan is a single scan that scales linearly with corpus
bytes; the output partitioning inherits the input's, and a downstream
embed/dedup stage shuffles on its own keys, not ours. No UDFs — the whole
chain is codegen'd JVM expressions, and the chunk arithmetic is pure
integers so a SQL oracle replays it byte-identically.

Chunk identity: ``chunk_uid`` is the md5-derived 60-bit portable hash of
``doc_id ':' chunk_idx`` — stable across re-runs and partitionings, usable
directly as the id column for the dedup/similarity operators downstream.

Beyond-reference operator (SURVEY §2.9); no flatbread counterpart.
"""
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flatbread_spark.operators.dedup import portable_hash60


def _n_chunks(n: Column, window: int, stride: int) -> Column:
    """How many windows cover ``n`` tokens: 1 if n <= window, else
    ceil((n - window) / stride) + 1 — integer arithmetic only."""
    return F.when(n <= window, F.lit(1)).otherwise(
        ((n - window + stride - 1) / stride).cast("bigint") + 1
    )


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_words: int = 128,
    stride_words: int = 96,
    min_chunk_words: int = 1,
    keep_text: bool = True,
) -> DataFrame:
    """Explode each document into overlapping word windows.

    Output columns: ``id_col``, ``chunk_idx`` (0-based), ``start_word``
    (0-based offset into the whitespace token stream), ``n_chunk_words``,
    ``chunk_uid`` (portable 60-bit hash), and ``chunk_text`` unless
    ``keep_text=False`` (embedding pipelines that hash/vectorize in the
    same stage can drop the string to halve the exploded width).

    ``min_chunk_words`` drops trailing runt windows (only the LAST window
    of a document can be shorter than ``window_words``); the default 1
    keeps every window so coverage is total.
    """
    if stride_words < 1 or window_words < 1:
        raise ValueError("window_words and stride_words must be >= 1")
    if stride_words > window_words:
        raise ValueError(
            "stride_words > window_words would skip tokens between chunks"
        )
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words).cast("bigint")
    base = df.select(
        F.col(id_col),
        words.alias("__w__"),
        n.alias("__n__"),
        _n_chunks(n, window_words, stride_words).alias("__nc__"),
    )
    start = (F.col("chunk_idx") * stride_words).cast("bigint")
    piece = F.slice(F.col("__w__"), start + 1, window_words)
    out = (
        base.select(
            id_col,
            "__w__",
            "__n__",
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("__nc__") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            start.alias("start_word"),
            F.least(F.lit(window_words).cast("bigint"), F.col("__n__") - start).alias(
                "n_chunk_words"
            ),
            portable_hash60(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(":"), F.col("chunk_idx")
                )
            ).alias("chunk_uid"),
            F.concat_ws(" ", piece).alias("chunk_text"),
        )
        .filter(F.col("n_chunk_words") >= min_chunk_words)
    )
    if not keep_text:
        out = out.drop("chunk_text")
    return out
