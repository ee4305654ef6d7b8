"""Bloom-filter corpus membership: build once, probe cheaply, never miss.

The batch-vs-corpus dedup problem at 100 TB: the corpus key set is
billions of rows, and a per-batch hash-partitioned anti-join re-shuffles
corpus keys for every incoming batch (operators/dedup.py
``dedup_incremental`` — exact, but pays the join). A Bloom filter
compresses the corpus membership set to ``m_bits`` bits with NO false
negatives: a batch row that probes "absent" is definitely novel, so the
exact join only needs to run on the (tiny) "maybe present" remainder —
the classic two-tier filter.

Representation: the filter is itself a DataFrame of (word_idx, bits) —
32-bit words packed in BIGINT so every shift/mask stays inside signed
arithmetic in both Spark and ANSI SQL (bit 63 sign traps avoided by
construction). Build is one map-side explode (k probes per key) plus one
``bit_or`` aggregation shuffled on word_idx — bounded by m/32 rows
regardless of corpus size. Probe is the same explode joined against the
words table: for the common sizings (m up to a few billion bits → tens of
MB) the words side BROADCASTS and the probe is shuffle-free; past that it
degrades gracefully to an equi-join on word_idx, never all-pairs.

All hashing is the portable md5-derived 60-bit hash, so a SQL oracle
replays the exact bit pattern — including false positives — bit for bit.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; for n corpus keys at
10 bits/key and k=3, FPR ≈ 1.7%. The filter NEVER false-negatives, so
correctness of the two-tier pipeline does not depend on sizing — only the
size of the exact-check remainder does.

Beyond-reference operator (SURVEY §2.9); no flatbread counterpart.
"""
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flatbread_spark.operators.dedup import portable_hash60

WORD_BITS = 32


def _probe_pos(key: Column, i: Column, m_bits: int, salt: str) -> Column:
    """Bit position of probe ``i`` for ``key``: md5-portable, in [0, m)."""
    return (
        portable_hash60(
            F.concat(F.lit(salt), key.cast("string"), F.lit("#"), i.cast("string"))
        )
        % m_bits
    )


# pyspark's F.shiftleft only takes a literal shift amount, so the per-row
# mask goes through the SQL form (both operands are expressions there)
_MASK_EXPR = "shiftleft(cast(1 as bigint), cast(__pos__ % 32 as int))"


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    salt: str = "bl#",
) -> DataFrame:
    """Aggregate the corpus into a Bloom filter: (word_idx, bits) rows,
    at most m_bits/32 of them. One scan, one word_idx-keyed shuffle whose
    size is bounded by the filter, not the corpus."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    if k < 1:
        raise ValueError("k must be >= 1")
    probe = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__i__")
    pos = _probe_pos(F.col(key_col), F.col("__i__"), m_bits, salt)
    return (
        df.select(F.col(key_col), probe)
        .select(pos.alias("__pos__"))
        .select(
            F.floor(F.col("__pos__") / WORD_BITS).cast("bigint").alias("word_idx"),
            F.expr(_MASK_EXPR).alias("__m__"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m__").alias("bits"))
    )


def bloom_check(
    keys: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int = 3,
    salt: str = "bl#",
    result_col: str = "maybe_present",
    broadcast_bloom: bool = True,
) -> DataFrame:
    """Probe every row of ``keys`` against a built filter. Adds
    ``result_col``: True means "possibly in the corpus" (false positives
    at the sized FPR), False means "definitely novel" (no false
    negatives). ``broadcast_bloom=False`` for filters too big to ship to
    every executor — the probe becomes a word_idx equi-join instead."""
    probe = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__i__")
    pos = _probe_pos(F.col(key_col), F.col("__i__"), m_bits, salt)
    probes = (
        keys.select(F.col(key_col), probe)
        .select(key_col, pos.alias("__pos__"))
        .select(
            key_col,
            F.floor(F.col("__pos__") / WORD_BITS).cast("bigint").alias("word_idx"),
            F.expr(_MASK_EXPR).alias("__m__"),
        )
    )
    words = F.broadcast(bloom) if broadcast_bloom else bloom
    hit = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("__m__")) == F.col("__m__")
    )
    return (
        probes.join(words, "word_idx", "left")
        .groupBy(key_col)
        .agg(F.bool_and(hit).alias(result_col))
    )


def bloom_filter_novel(
    batch: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int = 3,
    salt: str = "bl#",
    broadcast_bloom: bool = True,
) -> DataFrame:
    """Keep only the rows whose key is DEFINITELY not in the corpus.
    This is the cheap first tier: the dropped "maybe" rows include the
    FPR-sized sliver of novel rows, so an exactness-critical pipeline
    routes the maybes through the exact join (dedup_incremental) instead
    of discarding them."""
    flags = bloom_check(
        batch.select(key_col).distinct(),
        key_col,
        bloom,
        m_bits,
        k,
        salt,
        broadcast_bloom=broadcast_bloom,
    )
    return (
        batch.join(flags, key_col, "left")
        .filter(~F.col("maybe_present"))
        .drop("maybe_present")
    )
