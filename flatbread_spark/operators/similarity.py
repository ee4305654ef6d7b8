"""Similarity search over embedding columns.

- ``knn_bruteforce``: exact top-k cosine for a (small) query set — broadcast
  the queries against the corpus, window-rank per query. The baseline and the
  verification oracle for the approximate paths.
- ``knn_lsh``: random-hyperplane (sign) LSH — deterministic seeded planes,
  multi-probe by matching any of ``tables`` independent signatures, exact
  re-rank inside candidate buckets. The scale path: the corpus is hashed once
  (linear scan, no shuffle), candidates come from a bucket equi-join instead
  of a full cross product.
- ``ivf_assign`` / ``knn_ivf``: IVF-style coarse quantization — assign every
  vector to its nearest of ``centroids`` (broadcast), search only the
  ``nprobe`` closest cells. Centroids are caller-provided (e.g. sampled ids),
  keeping the operator deterministic and shuffle-free on the corpus side.
"""
from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flatbread_spark.functions.vectors import cosine_exact, cosine_fast, dot_fast


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exact: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self excluded).

    Returns (query_id, neighbor_id, cos, rank). Deterministic: exact-decimal
    cosine + (cos desc, neighbor id asc) ranking.
    """
    # Per-vector norms are computed ONCE per row BEFORE the pair join: the
    # hot loop is O(|q|·|c|) pairs, and cosine_fast's inline norms would
    # re-reduce both 64-float arrays per PAIR — 3x the higher-order-function
    # work for the same bits (sqrt-then-multiply is the identical double
    # expression either way, so shortlist order is unchanged).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("__cn"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    if not exact:
        cos = dot_fast(F.col("__qv"), F.col("__cv")) / (
            F.col("__qn") * F.col("__cn")
        )
        scored = (
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

    # exact mode, two-phase: the corpus-sized hot loop scores with plain
    # double cosine and keeps a 4k-deep shortlist per query; only the
    # shortlist is re-scored with exact-decimal cosine, which decides the
    # final ranking and the output value. A shortlist miss would need the
    # double vs decimal scores to disagree across a >3k-rank gap (~1e-12
    # cosine difference per rank) — not attainable with 6-digit rounding.
    #
    # The hot loop is an Arrow kernel (round 12, guide §4.2/§8): the old
    # plan materialized |queries|×|corpus| broadcast-join rows, evaluated
    # an interpreted HOF double dot per PAIR, and range-sorted all of it
    # through the per-query rank window. Now one numpy matmul per corpus
    # slab emits only per-slab shortlist candidates (a deterministic
    # value-superset — boundary ties all kept), the global window trims
    # them with the identical (fast desc, neighbor asc) order, and the
    # exact-decimal re-rank — unchanged, still the value contract — runs
    # on the same bounded shortlist. The query set is collected once: it
    # is small by contract (the old plan already broadcast it — the same
    # driver footprint).
    import numpy as np

    from flatbread_spark.functions._arrow_kernels import make_knn_shortlist_fn

    shortlist_depth = max(4 * k, k + 20)
    q_proj = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    q_rows = q_proj.collect()
    spark = corpus.sparkSession
    qf = spark.createDataFrame(q_rows, q_proj.schema)
    valid = [
        r for r in q_rows
        if r["__qv"] is not None
    ]
    dims = {len(r["__qv"]) for r in valid}
    dim = max(dims) if dims else 0
    valid = [r for r in valid if len(r["__qv"]) == dim]
    q_ids = [r["query_id"] for r in valid]
    q_mat = (
        np.array([list(r["__qv"]) for r in valid], dtype=np.float64)
        if valid
        else np.zeros((0, 0))
    )
    idt = corpus.schema[id_col].dataType.simpleString()
    kernel = make_knn_shortlist_fn(q_ids, q_mat, shortlist_depth)
    shortlist = (
        corpus.select(
            F.col(id_col).alias("__nid"), F.col(vec_col).alias("__cv")
        )
        .mapInPandas(
            kernel,
            f"query_id {idt}, neighbor_id {idt}, __fast double, "
            "__cv array<float>",
        )
        .withColumn(
            "__frank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("__fast"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("__frank") <= shortlist_depth)
        .join(F.broadcast(qf), "query_id")
    )
    cos = cosine_exact(F.col("__qv"), F.col("__cv"))
    return (
        shortlist.select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, nbits: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    planes = []
    for _ in range(nbits):
        v = [rnd.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(vec · plane_i). Expression-only."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        d = dot_fast(vec, F.array(*[F.lit(x) for x in p]).cast("array<float>"))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return bucket


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nbits: int = 8,
    tables: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of ``tables``
    sign-LSH tables; exact cosine re-rank. Returns (query_id, neighbor_id,
    cos, rank) — same shape as brute force so recall is directly measurable."""
    import numpy as np

    from flatbread_spark.functions._arrow_kernels import make_bucket_udf

    # all tables' hyperplanes stacked into one (tables*nbits, dim) matrix:
    # bucket assignment for the whole corpus is ONE Arrow-batched matmul per
    # partition batch instead of tables×nbits interpreted array-dot
    # expressions per row — the corpus-side scan is the scale cost here.
    planes_mat = np.array(
        [p for t in range(tables) for p in _hyperplanes(dim, nbits, seed + 1000 * t)],
        dtype=np.float64,
    )
    all_buckets = make_bucket_udf(planes_mat, tables, nbits)

    def with_buckets(df, prefix):
        out = df.select(
            F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias(f"__{prefix}v")
        ).withColumn("__bks", all_buckets(F.col(f"__{prefix}v")))
        return out.select(
            f"{prefix}_id", f"__{prefix}v",
            F.posexplode("__bks").alias("__t", "__b"),
        )

    cb = with_buckets(corpus, "neighbor")
    qb = with_buckets(queries, "query")
    cands = (
        cb.join(
            F.broadcast(qb),
            (cb["__t"] == qb["__t"]) & (cb["__b"] == qb["__b"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", "__queryv", "__neighborv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # same two-phase discipline as knn_bruteforce: candidates (the hot set —
    # thousands per query) rank by fast double cosine first; only a bounded
    # shortlist pays the exact-decimal re-score that decides output values
    shortlist_depth = max(4 * k, k + 20)
    wf = Window.partitionBy("query_id").orderBy(F.desc("__fast"), F.asc("neighbor_id"))
    shortlist = (
        cands.withColumn(
            "__fast", cosine_fast(F.col("__queryv"), F.col("__neighborv"))
        )
        .withColumn("__frank", F.row_number().over(wf))
        .filter(F.col("__frank") <= shortlist_depth)
    )
    cos = cosine_exact(F.col("__queryv"), F.col("__neighborv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        shortlist.select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell). Centroids ride
    inside an Arrow-batched matmul kernel (closure-captured matrix — Spark
    broadcasts it with the serialized UDF): one linear scan, no shuffle, no
    O(centroids×dim) literal tree in the plan. Ties → lowest centroid id."""
    probe = _probe_udf(centroids, 1)
    return corpus.select(
        F.col(id_col), F.col(vec_col),
        F.element_at(probe(F.col(vec_col)), 1).alias("cell"),
    )


def _probe_udf(centroids, nprobe: int):
    from flatbread_spark.functions._arrow_kernels import make_ivf_probe_udf

    return make_ivf_probe_udf(
        [vec for _, vec in centroids], [cid for cid, _ in centroids], nprobe
    )


def ivf_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 3,
) -> DataFrame:
    """Scored IVF candidates with the probe POSITION carried through:
    ``(query_id, neighbor_id, pos, cos)`` where ``pos`` is the rank of the
    matched cell in the query's nearest-cell ordering. Because the probe
    kernel ranks cells once, the ``nprobe=n`` candidate set for any
    ``n <= nprobe`` is exactly ``pos < n`` — which is what lets a tuning
    sweep share one candidate join across all its sweep points.
    At scale the cell equi-join replaces the full cross product —
    candidate count ≈ corpus × nprobe / n_cells."""
    cells = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "cell"
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.posexplode(_probe_udf(centroids, nprobe)(F.col(vec_col))).alias(
            "pos", "cell"
        ),
    )
    cands = cells.join(
        F.broadcast(probes),
        (cells["cell"] == probes["cell"]) & (F.col("query_id") != F.col("neighbor_id")),
    )
    cos = cosine_exact(F.col("__qv"), F.col("__cv"))
    return cands.select(
        "query_id", "neighbor_id", "pos", F.round(cos, 6).alias("cos")
    )


def rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k over a scored candidate frame:
    rank by (cos desc, neighbor_id asc) — the tie-break every knn_* result
    and oracle in this repo shares."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors assigned to their nearest
    centroid cell (one scan), each query probes its ``nprobe`` nearest cells,
    candidates re-ranked with exact-decimal cosine. Same output shape as
    ``knn_bruteforce`` so recall is directly measurable. Composition of
    :func:`ivf_candidates` + :func:`rank_topk` — the tuning sweep reuses the
    same pieces, so scoring/tie-break semantics cannot desync."""
    return rank_topk(
        ivf_candidates(corpus, queries, centroids, id_col, vec_col, nprobe), k
    )


def knn_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    shortlist: int | None = None,
) -> DataFrame:
    """Approximate top-k over INT8-quantized vectors — the memory/IO scale
    path (codes are 4× smaller than float32; the corpus-side scan reads
    codes, not floats). Two-phase:

    1. SHORTLIST by the integer code dot product ``Σ qcᵢ·ccᵢ`` — all-BIGINT
       (codes are in [-127,127], so 64-dim dots fit in 21 bits; no
       overflow until ~2^40 dims), hence byte-identical across engines and
       partitionings: the candidate set an oracle replays is EXACTLY this
       engine's. Raw code-dot ranking ignores the per-vector scales —
       unbiased for (near-)unit-norm embeddings, the common corpus case;
       for wildly varying norms compose with IVF cells instead.
    2. exact-decimal cosine on the ORIGINAL floats re-ranks the shortlist
       and decides the output values (same discipline as
       ``knn_bruteforce``) — quantization error can only cost shortlist
       recall, never corrupt a returned score.

    At open-corpus scale the all-pairs candidate join here is replaced by
    any bucketed candidate source (:func:`ivf_candidates` /
    :func:`knn_lsh`) feeding the same two phases; this operator is the
    quantized-scoring building block plus the small-query-set search.
    Returns ``(query_id, neighbor_id, qdot, cos, rank)``.
    """
    from flatbread_spark.functions.vectors import int8_codes, int8_scale

    if shortlist is None:
        shortlist = max(4 * k, k + 20)
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} must be >= k {k}")

    def staged(df, prefix):
        scale = int8_scale(F.col(vec_col))
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"__{prefix}v"),
            int8_codes(F.col(vec_col), scale).alias(f"__{prefix}c"),
        )

    c = staged(corpus, "neighbor")
    q = staged(queries, "query")
    qdot = F.aggregate(
        F.zip_with(F.col("__queryc"), F.col("__neighborc"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("qdot"), F.asc("neighbor_id")
    )
    short = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__queryv", "__neighborv",
                qdot.alias("qdot"))
        .withColumn("__srank", F.row_number().over(ws))
        .filter(F.col("__srank") <= shortlist)
    )
    cos = cosine_exact(F.col("__queryv"), F.col("__neighborv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        short.select("query_id", "neighbor_id", "qdot",
                     F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mine_contrastive_negatives(
    corpus: DataFrame,
    anchors: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_hard: int = 3,
    n_rand: int = 2,
    salt: str = "neg",
    n_buckets: int = 64,
) -> DataFrame:
    """Contrastive-training negative mining: for every anchor, its
    ``k_hard`` nearest corpus vectors by cosine (HARD negatives — the pairs
    an embedding model learns the most from) plus ``n_rand``
    hash-deterministic RANDOM negatives. Returns
    ``(anchor_id, other_id, kind 'hard'|'rand', cos)`` — ``cos`` NULL for
    random picks. A random pick may coincide with a hard negative
    (independent draws; the ``kind`` column disambiguates).

    Random-negative shape (the part naive implementations get wrong at
    scale): no global ordering, no per-anchor corpus scan. Every corpus row
    sits in one of ``n_buckets`` hash buckets; draw j of anchor a opens
    bucket ``h(a|j|salt) % B`` and takes the member minimizing
    ``h(member|a|j|salt)`` — one equi-join on the bucket key plus a
    per-(anchor, draw) rank window, deterministic under any partitioning
    and engine (portable md5 hashing throughout). A draw whose bucket
    contains only the anchor itself yields no row (vanishingly rare for
    B ≪ corpus; documented rather than patched with a rescan).

    Hard negatives reuse :func:`knn_bruteforce` (exact-decimal cosine);
    at open-corpus scale pass a candidate-bounded path instead —
    :func:`ivf_candidates` + :func:`rank_topk` — the same swap the knn
    queries make.
    """
    from flatbread_spark.operators.dedup import portable_hash60

    if k_hard <= 0 or n_rand < 0 or n_buckets <= 0:
        raise ValueError("need k_hard > 0, n_rand >= 0, n_buckets > 0")
    if anchors is None:
        anchors = corpus
    hard = knn_bruteforce(corpus, anchors, id_col, vec_col, k_hard).select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("other_id"),
        F.lit("hard").alias("kind"),
        "cos",
    )
    if n_rand == 0:
        return hard
    b = int(n_buckets)
    cb = corpus.select(
        F.col(id_col).alias("__cid"),
        (portable_hash60(F.col(id_col).cast("string")) % b).alias("__b"),
    )
    draws = (
        anchors.select(F.col(id_col).alias("__aid"))
        .select("__aid", F.explode(
            F.sequence(F.lit(0), F.lit(int(n_rand) - 1))).alias("__j"))
        .withColumn(
            "__b",
            portable_hash60(
                F.concat_ws("|", F.col("__aid").cast("string"),
                            F.col("__j").cast("string"), F.lit(salt))
            ) % b,
        )
    )
    pick = portable_hash60(
        F.concat_ws("#", F.col("__cid").cast("string"),
                    F.col("__aid").cast("string"),
                    F.col("__j").cast("string"), F.lit(salt))
    )
    w = Window.partitionBy("__aid", "__j").orderBy(pick.asc(), F.col("__cid").asc())
    rand = (
        draws.join(cb, "__b")
        .filter(F.col("__cid") != F.col("__aid"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__aid").alias("anchor_id"),
            F.col("__cid").alias("other_id"),
            F.lit("rand").alias("kind"),
            F.lit(None).cast("double").alias("cos"),
        )
    )
    return hard.unionByName(rand)


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_candidates: int = 20,
    n_select: int = 5,
    lambda_ppm: int = 700_000,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: from each query's
    ``k_candidates`` nearest vectors, greedily select ``n_select``
    balancing relevance against redundancy —
    ``score = λ·rel − (1−λ)·max_sim(·, selected)`` — the standard
    diversity re-ranker for RAG context assembly (five near-identical
    passages waste four context slots; MMR swaps them for coverage).
    Completes the retrieval family: bm25 (keyword), knn (semantic),
    rrf_fuse (consensus), mmr (diversity).

    All-integer arithmetic end to end: relevance and pairwise similarity
    are BIGINT int8-code dot products (the ``knn_quantized`` shortlist
    contract) and λ is ppm, so ``λ·rel − (1e6−λ)·max_sim`` stays in
    int64 (≤ 1e6 · 64·127² ≈ 1e12) and every greedy argmax has the total
    order ``(score desc, id asc)`` — deterministic under any
    partitioning, pinnable by an oracle.

    Scale shape: the candidate shortlist is one broadcast-query code-dot
    join + per-query top-k window (swap in ``ivf_candidates`` at open
    scale, as knn_quantized documents); the greedy loop runs per query
    group inside ``applyInPandas`` — Arrow-batched, state bounded by
    ``k_candidates`` codes, millions of queries parallelize by group.

    Returns ``(query_id, rank, neighbor_id, mmr_score)``.
    """
    if n_select < 1 or k_candidates < n_select:
        raise ValueError("need 1 <= n_select <= k_candidates")
    if not 0 <= lambda_ppm <= 1_000_000:
        raise ValueError("lambda_ppm must be in [0, 1e6]")
    from flatbread_spark.functions.vectors import int8_codes, int8_scale

    def staged(df, prefix):
        scale = int8_scale(F.col(vec_col))
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            int8_codes(F.col(vec_col), scale).alias(f"__{prefix}c"),
        )

    c = staged(corpus, "neighbor")
    q = staged(queries, "query")
    rel = F.aggregate(
        F.zip_with(F.col("__queryc"), F.col("__neighborc"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("neighbor_id")
    )
    cand = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", rel.alias("rel"), "__neighborc")
        .withColumn("__srank", F.row_number().over(ws))
        .filter(F.col("__srank") <= k_candidates)
        .drop("__srank")
    )

    lam, n_sel = int(lambda_ppm), int(n_select)

    def greedy(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy()
        rels = pdf["rel"].to_numpy(dtype=np.int64)
        codes = np.array(
            [np.asarray(x, dtype=np.int64) for x in pdf["__neighborc"]]
        )
        n = len(ids)
        max_sim = None  # true max over SELECTED (may be negative)
        picked = np.zeros(n, dtype=bool)
        out = []
        for r in range(min(n_sel, n)):
            if max_sim is None:
                score = lam * rels
            else:
                score = lam * rels - (1_000_000 - lam) * max_sim
            score = np.where(picked, np.iinfo(np.int64).min, score)
            best = int(np.argmax(score))  # ids sorted asc -> first max wins ties
            picked[best] = True
            out.append((int(pdf["query_id"].iloc[0]), r + 1, int(ids[best]),
                        int(score[best])))
            sims = codes @ codes[best]
            max_sim = sims if max_sim is None else np.maximum(max_sim, sims)
        return pd.DataFrame(
            out, columns=["query_id", "rank", "neighbor_id", "mmr_score"]
        )

    return cand.groupBy("query_id").applyInPandas(
        greedy,
        "query_id bigint, rank bigint, neighbor_id bigint, mmr_score bigint",
    )
