"""Deduplication operators for document corpora.

North-star pipeline ops (BASELINE.json): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup. Each is designed shuffle-minimal:

- exact: one hash-groupBy on a 64/128-bit content fingerprint — never on the
  raw text (shuffling full documents to dedup them is the classic 100 TB
  mistake; only (hash, id) pairs move).
- ngram-Jaccard: shingle → explode → self-join on shingle → pair-count.
  The shingle join is the scale hazard: frequent shingles explode pairwise.
  ``block_col`` (e.g. language) and distinct-shingles cap the blowup; for
  open-domain corpora use ``minhash_lsh_pairs`` instead, which bounds
  candidate pairs by banding.
- MinHash-LSH: deterministic universal hashing (a*x+b mod p) over shingle
  xxhash64s, banded into buckets, candidates verified with exact Jaccard.
  All expression-level (no Python per row).
- SimHash: per-token 64-bit hashes bit-voted into a document signature;
  near-dups = signatures within Hamming distance k (verified via xor popcount
  over band-bucketed candidates).
- embedding: exact cosine over block-bucketed pairs.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flatbread_spark.functions.text import fingerprint_md5, word_shingles
from flatbread_spark.functions.vectors import cosine_exact

# Mersenne prime 2^31-1 for universal hashing: with h, a, b < 2^31 the
# products stay under 2^62, safely inside BIGINT (no overflow under ANSI mode)
_P = (1 << 31) - 1


def dedup_exact(
    df: DataFrame,
    id_col: str,
    content_col: str,
    portable_hash: bool = True,
) -> DataFrame:
    """Keep the lowest id per distinct content; report the duplicate count.

    Returns (id_col, fingerprint, n_dups). ``portable_hash=True`` uses md5
    (ANSI-SQL-reproducible); False uses xxhash64 (faster, Spark-native).
    Only (hash, id) shuffles — content never moves.
    """
    fp = fingerprint_md5(F.col(content_col)) if portable_hash else F.xxhash64(content_col).cast("string")
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .select(id_col, "fingerprint", "n_dups")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """All pairs (a < b) with word-n-gram Jaccard ≥ threshold.

    Returns (id_a, id_b, jaccard). ``block_col`` restricts candidate pairs to
    equal blocks (language, source, length bucket …) — at corpus scale always
    block or use MinHash-LSH banding first.
    """
    blocks = [block_col] if block_col else []
    sh = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(b) for b in blocks],
        F.explode(word_shingles(F.col(text_col), n)).alias("__sh"),
    )
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))

    a, b = sh.alias("a"), sh.alias("b")
    join_cond = (F.col("a.__sh") == F.col("b.__sh")) & (F.col("a.__id") < F.col("b.__id"))
    for blk in blocks:
        join_cond &= F.col(f"a.{blk}") == F.col(f"b.{blk}")
    inter = (
        a.join(b, join_cond)
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__sz", "__sa"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__sz", "__sb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (F.col("__sa") + F.col("__sb") - F.col("__inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def _minhash_signature(shingles: Column, num_hashes: int, seed: int = 42) -> Column:
    """array<bigint> MinHash signature from deterministic universal hashes
    h_i(x) = (a_i * xxhash64(x) + b_i) mod p over the shingle set."""
    import random

    rnd = random.Random(seed)
    coeffs = [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num_hashes)]
    hashed = F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % _P)
    sigs = []
    for a, b in coeffs:
        sigs.append(
            F.array_min(
                F.transform(hashed, lambda h: (h * a + b) % _P)
            )
        )
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    rows/bands = r; two docs collide if any band of r minhashes matches —
    P(collide) ≈ 1-(1-j^r)^b, the classic S-curve around the threshold.
    Candidates are then verified with exact Jaccard on distinct shingles so
    the output is exact-above-threshold (LSH only bounds the candidate set;
    at 100 TB banding is what keeps the join from being all-pairs).
    Returns (id_a, id_b, jaccard).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(F.col(text_col), n).alias("__sh"),
    ).withColumn("__sig", _minhash_signature(F.col("__sh"), num_hashes, seed))

    bands_df = base.select(
        "__id", "__sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.concat_ws(",", *[F.element_at("__sig", i * r + j + 1).cast("string") for j in range(r)]).alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("__id", "__sh", F.col("bk.band").alias("__band"), F.col("bk.key").alias("__key"))

    a, b = bands_df.alias("a"), bands_df.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
            F.col("a.__sh").alias("sh_a"), F.col("b.__sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.withColumn("jaccard", F.round(inter.cast("double") / union.cast("double"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text: Column, n: int = 2) -> Column:
    """64-bit SimHash over word n-gram shingles: each shingle's xxhash64
    votes ±1 per bit; the signature is the sign vector. Expression-only."""
    sh = word_shingles(text, n)

    def bit_vote(i: int):
        return F.aggregate(
            sh,
            F.lit(0),
            lambda acc, s: acc
            + F.when(
                F.shiftright(F.xxhash64(s), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    sig = F.lit(0).cast("bigint")
    for i in range(63):
        sig = sig + F.when(bit_vote(i) > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    # bit 63 is the sign bit: adding -(2^63) sets it without overflow
    sig = sig + F.when(bit_vote(63) > 0, F.lit(-(1 << 63)).cast("bigint")).otherwise(0)
    return sig


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Banding: split the 64-bit signature into ``bands`` chunks; by pigeonhole
    any pair within distance < bands shares at least one exact chunk, so the
    join is on chunk equality, then popcount-verified. Returns
    (id_a, id_b, hamming)."""
    w = 64 // bands
    sigd = df.select(F.col(id_col).alias("__id"), simhash64(F.col(text_col), n).alias("__sig"))
    chunks = sigd.select(
        "__id", "__sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("__sig", i * w).bitwiseAND(F.lit((1 << w) - 1)).alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("__id", "__sig", F.col("bk.band").alias("__band"), F.col("bk.key").alias("__key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    xor = F.col("a.__sig").bitwiseXOR(F.col("b.__sig"))
    ham = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"), ham.alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Near-dup pairs by exact cosine ≥ threshold, optionally block-bucketed
    (block_col = cluster/LSH bucket/label). Exact-decimal cosine ⇒
    SQL-oracle-reproducible. Returns (id_a, id_b, cos)."""
    cols = [F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")]
    if block_col:
        cols.append(F.col(block_col).alias("__blk"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    if block_col:
        cond &= F.col("a.__blk") == F.col("b.__blk")
    cos = cosine_exact(F.col("a.__v"), F.col("b.__v"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
