"""Entity resolution: blocked fuzzy matching over string keys.

Catalog / metadata dedup ("are 'red widgett' and 'red widget' the same
product?") is a different problem from document dedup: the universe is the
DISTINCT value set (bounded by the vocabulary, not the row count), and the
match predicate is edit distance, which no sort/hash join can evaluate
directly. The scale-correct shape is the classic blocking pattern:

1. reduce to distinct values + occurrence counts (one hash aggregate —
   after this step the problem size is vocabulary-sized and INDEPENDENT of
   corpus row count; 10× more rows with the same catalog costs only the
   aggregate),
2. derive one or more cheap blocking keys per value (default: first
   token). Candidate pairs exist only WITHIN a block → the join is a keyed
   equi-join, shuffle-partitionable, never a cross join,
3. verify candidates with exact ``levenshtein`` ≤ ``max_dist`` (JVM
   codegen, no Python), keeping ``name_a < name_b`` to emit each unordered
   pair once.

Block sizes bound the quadratic term: cost is Σ|block|², so the blocking
key should split the vocabulary well (add a length bucket or a second
phonetic key for coarse vocabularies). The block-size histogram to audit
that is one groupBy away; a runaway block is data-visible, not a silent
executor OOM, via ``max_block`` which fails loudly when any block exceeds
it.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flatbread_spark.cache import pin


def first_token_block(col: Column) -> Column:
    """Default blocking key: lowercase first whitespace token."""
    return F.split(F.lower(F.trim(col)), r"\s+").getItem(0)


def _name_vocab(df: DataFrame, name_col: str, block_key) -> DataFrame:
    """Step 1 of the blocking pattern: the PERSISTED ``(name, n, block)``
    distinct-value frame. This is the only corpus-scale pass in the module;
    everything downstream (block-size guard, self-join sides, canonical
    vote) is vocabulary-sized, so it is pinned (``cache.pin`` tag
    ``linkage``) — without the pin each downstream lineage re-derived the
    full corpus aggregate (the self-join alone twice), putting up to nine
    corpus scans in canonicalize_names' plan for a problem the docstring
    correctly calls vocabulary-sized after this step. Release with
    ``flatbread_spark.release_caches("linkage")``."""
    return pin(
        df.filter(F.col(name_col).isNotNull())
        .groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("block", block_key(F.col("name"))),
        tag="linkage",
    )


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block_key=first_token_block,
    max_block: int = 100_000,
    _vocab: DataFrame | None = None,
) -> DataFrame:
    """All unordered pairs of DISTINCT ``name_col`` values that share a
    block and are within ``max_dist`` Levenshtein edits (0 < dist ≤
    max_dist; exact duplicates collapse in step 1 and are not pairs).

    Returns ``name_a, name_b, dist, n_a, n_b`` where ``n_*`` are the row
    counts behind each distinct value — the "merge which into which"
    signal (canonicalize to the more frequent spelling).

    ``_vocab`` lets a caller that already built the pinned
    ``(name, n, block)`` frame (canonicalize_names) share it instead of
    re-aggregating the corpus.

    Side effect: calling this PERSISTS the distinct-name vocab frame
    (``cache.pin`` tag ``linkage``) — it is vocabulary-sized and the
    returned lazy pairs read it from both self-join sides. Release it
    with ``flatbread_spark.release_caches("linkage")`` once the result
    is materialized.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    vocab = _vocab if _vocab is not None else _name_vocab(df, name_col, block_key)
    # loud guard: a degenerate blocking key (e.g. every name starts with
    # 'the') turns the self-join quadratic; fail with the block id instead
    # of letting one task run for hours. ONE window count over the
    # self-join's own key (the pagerank out-degree shape): the old
    # aggregate + broadcast-join-back spent an extra exchange plus a
    # broadcast-build job per execution — and on a cold run the broadcast
    # build replayed the uncached vocab aggregate's stage-jobs — for a
    # column the block-partitioned window computes in the shuffle the
    # join needs anyway. Same counts, same per-row raise semantics.
    from pyspark.sql import Window

    bn = F.count(F.lit(1)).over(Window.partitionBy("block"))
    vocab = (
        vocab.withColumn("__bn", bn)
        .withColumn(
            "block",
            F.when(F.col("__bn") <= F.lit(max_block), F.col("block")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("fuzzy_match_pairs: block over max_block: "),
                        F.col("block"),
                    )
                )
            ),
        )
        .drop("__bn")
    )
    a = vocab.select(
        "block",
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = vocab.select(
        "block",
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(b, "block").filter(F.col("name_a") < F.col("name_b"))
    return (
        pairs.withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("dist") <= F.lit(max_dist))
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


def canonicalize_names(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block_key=first_token_block,
) -> DataFrame:
    """Map each distinct ``name_col`` value to a canonical spelling: the
    most frequent name within its fuzzy-match neighborhood (ties broken
    lexicographically). Single-hop resolution — each variant points at the
    best DIRECT match, which canonicalizes the dominant typo→truth edges
    without the transitive-chain risk of merging 'cat'→'car'→'card'.
    (For full transitive clusters feed the pairs to graph.cluster_edges.)

    Returns ``name, canonical, n`` for every distinct value (identity rows
    included), so a left join on ``name`` rewrites the corpus.

    Side effect: persists the vocabulary-sized ``(name, n, block)`` frame
    (``cache.pin`` tag ``linkage``); release with
    ``flatbread_spark.release_caches("linkage")`` after materializing.
    """
    v = _name_vocab(df, name_col, block_key)
    vocab = v.select("name", "n")
    pairs = fuzzy_match_pairs(df, name_col, max_dist, block_key, _vocab=v)
    # undirected edges → directed "candidate canonical" per name, emitted
    # BOTH ways from one Generate — a unionByName of two selects over the
    # same pairs frame re-derived the whole blocked levenshtein join twice
    cand = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("name_a").alias("name"),
                    F.col("name_b").alias("cand"),
                    F.col("n_b").alias("cand_n"),
                ),
                F.struct(
                    F.col("name_b").alias("name"),
                    F.col("name_a").alias("cand"),
                    F.col("n_a").alias("cand_n"),
                ),
            )
        ).alias("__e")
    ).select("__e.*")
    # struct max = (highest cand_n, then lexicographically greatest cand):
    # fully deterministic under any partitioning, unlike bare max_by ties
    best = cand.groupBy("name").agg(
        F.max(F.struct(F.col("cand_n"), F.col("cand"))).alias("__b")
    )
    return (
        vocab.join(best, "name", "left")
        .select(
            "name",
            F.when(
                F.col("__b.cand_n") > F.col("n"), F.col("__b.cand")
            ).otherwise(F.col("name")).alias("canonical"),
            "n",
        )
    )
