"""Skew mitigation: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one dominant language, an empty-string
group, a viral document) turn a groupBy/join into a single straggler task.
Spark's AQE skew-join handles sort-merge joins at runtime; these helpers
cover the remaining cases explicitly:

- ``salted_agg``: two-stage aggregation — stage 1 groups by (key, salt) so a
  hot key's rows spread over ``n_salts`` tasks and combine map-side; stage 2
  merges the per-salt partials. Works for any algebraic aggregate given its
  (partial, merge) pair; sums/counts/min/max merge with themselves.
- ``salt_explode_join``: broadcast-unfriendly dim joined against a skewed
  fact: fact side gets a random-but-deterministic salt in [0, n); dim side is
  exploded n× (one row per salt) so the equi-join key becomes (key, salt) and
  the hot key's matches spread across n partitions.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT = "__salt__"


def _fact_salt(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic pseudo-random salt in [0, n_salts): hash of the full row
    keys (stable across retries, unlike rand())."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name → (stage1 aggregate over input columns,
    stage2 aggregate over the stage-1 column of that name). Example::

        salted_agg(df, ["lang"], {
            "n":   (F.count(F.lit(1)), F.sum("n")),
            "tot": (F.sum("value"),    F.sum("tot")),
        })
    """
    keys = list(keys)
    salt_cols = list(salt_on) if salt_on is not None else list(df.columns)
    salted = df.withColumn(SALT, _fact_salt(salt_cols, n_salts))
    partial = salted.groupBy(*keys, SALT).agg(
        *[e.alias(name) for name, (e, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def skew_profile(
    df: DataFrame, keys: Sequence[str], top_k: int = 10
) -> DataFrame:
    """Key-skew diagnostic for a planned join/agg: the top-``top_k``
    heaviest keys with integer parts-per-million shares, plus the
    whole-table aggregates needed to size a mitigation.

    This is the "measure, don't guess" step before choosing ``salted_agg``
    / ``salt_explode_join`` factors or trusting AQE's skew-join split: at
    100 TB a key holding 4% of rows means one task processes 4 TB, and the
    time to learn that is BEFORE the 6-hour job, from a profile that costs
    one map-side-combining groupBy. Everything stays integer (counts and
    floor-divided ppm shares) so results are byte-identical across engines
    and partitionings — no float tolerance.

    Output, one row per heavy key ordered by rank:

    - ``rank``            1..top_k by (count desc, key asc) — deterministic
    - ``key``             the key columns rendered ``'\\x1f'``-joined (nulls
                          as ``'<NULL>'``), so multi-column keys profile
                          without a struct column
    - ``n``               rows carrying the key
    - ``share_ppm``       floor(n * 1e6 / n_rows)
    - ``cum_share_ppm``   running sum of share_ppm over ranks 1..rank
    - ``n_rows``          total rows (same every row)
    - ``n_keys``          distinct keys (same every row)
    - ``skew_x``          floor(n * n_keys / n_rows) — the key's multiple
                          of the mean key size; a direct ``n_salts``
                          suggestion for ``salted_agg`` (skew_x ≤ 1 means
                          no mitigation needed)

    Scale: one groupBy on the profiled keys (partial aggregation map-side,
    so the hot key itself cannot straggle THIS job), a single-row global
    aggregate joined by broadcast-able cross join, and a driver-bounded
    top-k (TakeOrderedAndProject — only ``top_k × partitions`` rows merge).
    """
    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    key_str = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(k).cast("string"), F.lit("<NULL>")) for k in keys]
    )
    per_key = (
        df.select(key_str.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = per_key.agg(
        F.sum("n").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = (
        per_key.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    w = (
        Window.orderBy(F.col("n").desc(), F.col("key").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        # `div` = BIGINT integral division: exact past 2^53 rows, where
        # double-divide-then-floor would round
        top.withColumn(
            "share_ppm", F.expr("(n * CAST(1000000 AS BIGINT)) div n_rows")
        )
        .withColumn("cum_share_ppm", F.sum("share_ppm").over(w).cast("bigint"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("key").asc()))
            .cast("bigint"),
        )
        .withColumn("skew_x", F.expr("(n * n_keys) div n_rows"))
        .select(
            "rank", "key", "n", "share_ppm", "cum_share_ppm",
            "n_rows", "n_keys", "skew_x",
        )
    )


def join_estimate(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """EXACT pre-join cardinality and fanout profile: before running a
    fact×fact join at 100 TB, learn its output size and which keys
    dominate it — from two map-side-combining groupBys and a join of the
    per-key COUNT tables (one groupBy and no join at all when both sides
    are the same logical plan — the self-join blowup check; key-
    cardinality rows, never the inputs; side
    effect: the joined count table is persisted — ``cache.pin`` tag
    ``skew`` — so the totals aggregate and the top-k read it once instead
    of each replaying both fact groupBys; release with
    ``flatbread_spark.release_caches("skew")`` once the result is
    materialized).

    The output-size identity is exact, not an estimate-by-sampling:
    ``|A ⋈ B| = Σ_k n_A(k) · n_B(k)``. A key with n_pairs = 10¹⁰ is a
    blowup you want to see BEFORE the shuffle, when the fix (salting,
    pre-aggregation, or questioning the join condition) is still cheap.
    Companion to :func:`skew_profile`, which profiles one side; this
    profiles the interaction.

    Output, one row per top-``top_k`` key by (n_pairs desc, key asc):

    - ``rank``, ``key`` (``'\\x1f'``-joined, nulls as ``'<NULL>'`` —
      display only; counting groups by the REAL columns)
    - ``n_left``/``n_right``  per-side multiplicities
    - ``n_pairs``             n_left · n_right
    - ``est_rows``            Σ n_pairs over ALL matching keys (same every
                              row) — the exact inner-join output size
    - ``n_matching_keys``     distinct keys present on both sides

    All BIGINT; n_pairs overflows int64 only past ~3·10⁹ × 3·10⁹ on one
    key — a join nobody should run, and Spark's ANSI mode fails loudly
    rather than wrapping.
    """
    on = list(on)
    if not on:
        raise ValueError("on must be non-empty")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(*on).agg(F.count(F.lit(1)).alias(name))

    # SELF-join profile fast path: when both sides are the same logical
    # plan (the common "how badly does this table self-join" blowup
    # check), n_right(k) == n_left(k) by definition — one fact groupBy
    # and a column copy replace two groupBys plus a count-table join
    # (halves the fact scans/shuffles, and removes the join AQE would
    # otherwise execute as extra stage-jobs: the round-11 join_estimate
    # driver-outlier's dominant line item). ``sameSemantics`` is Spark's
    # own canonical-plan equality — exact, no false positives.
    if left is right or left.sameSemantics(right):
        both = counts(left, "n_left").withColumn("n_right", F.col("n_left"))
    else:
        both = counts(left, "n_left").join(counts(right, "n_right"), on)
    key_str = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(k).cast("string"), F.lit("<NULL>")) for k in on]
    )
    from flatbread_spark.cache import pin

    # key-cardinality-sized, consumed by BOTH the totals aggregate and the
    # top-k — unpinned, each consumer replays the two fact-table groupBys
    # (four fact scans for a diagnostic meant to run BEFORE a 100 TB join)
    per_key = pin(
        both.select(
            key_str.alias("key"),
            "n_left",
            "n_right",
            (F.col("n_left") * F.col("n_right")).alias("n_pairs"),
        ),
        tag="skew",
    )
    totals = per_key.agg(
        F.sum("n_pairs").alias("est_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
    )
    top = (
        per_key.orderBy(F.col("n_pairs").desc(), F.col("key").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("n_pairs").desc(), F.col("key").asc()))
        .cast("bigint")
        .alias("rank"),
        "key", "n_left", "n_right", "n_pairs", "est_rows", "n_matching_keys",
    )


def salt_explode_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows salted, dim rows replicated n_salts×,
    join on (keys + salt). Semantically identical to ``fact.join(dim, on,
    how)`` for inner/left joins on unique dim keys."""
    on = list(on)
    f = fact.withColumn(SALT, _fact_salt(list(fact.columns), n_salts))
    d = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT, F.col(SALT).cast("int"))
    return f.join(d, on + [SALT], how).drop(SALT)


def field_association(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Contingency audit between two metadata fields — "is lang entangled
    with source?" — the check that catches stratification bugs (a sampler
    that accidentally made one source all-English) and tells you whether
    per-group statistics can be interpreted independently.

    Per observed (a, b) pair: the joint count, both marginals, the corpus
    total, and ``lift_ppm = n·N·1e6 div (n_a·n_b)`` — the observed/expected
    ratio in parts-per-million (1e6 = independent, >1e6 = the pair
    co-occurs more than its marginals predict). The product rides
    DECIMAL(38,0) so the formula cannot overflow BIGINT mid-expression at
    any corpus size; the result is exact integral division, byte-identical
    across engines.

    Scale shape: ONE partial-aggregated shuffle bounded by the distinct
    (a, b) vocabulary; marginals and the total are windows OVER THE COUNT
    TABLE (model-sized), never over the corpus.
    """
    counts = df.groupBy(col_a, col_b).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    # grand total as a broadcast 1-row scalar, NOT Window.partitionBy():
    # an unpartitioned window funnels the whole count table through one
    # partition, which stops being "model-sized" for high-cardinality
    # field pairs (domain x lang); the scalar join costs one extra tiny
    # stage and keeps every row where it is
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    out = (
        counts.withColumn("n_a", F.sum("n").over(wa).cast("bigint"))
        .withColumn("n_b", F.sum("n").over(wb).cast("bigint"))
        .crossJoin(F.broadcast(total))
    )
    dec = "decimal(38,0)"
    return out.withColumn(
        "lift_ppm",
        F.expr(
            f"CAST(n AS {dec}) * CAST(total AS {dec}) * 1000000 "
            f"div (CAST(n_a AS {dec}) * CAST(n_b AS {dec}))"
        ).cast("bigint"),
    )
