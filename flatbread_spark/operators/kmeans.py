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

- squared-distance terms are rounded to 12 decimals and accumulated in
  DECIMAL (associative — partition order can't move the result);
- assignment ties break on centroid id via struct-min;
- per-dim means accumulate coordinates as 12-decimal DECIMAL and divide as
  doubles — bit-identical in Spark and DuckDB;
- empty clusters keep their previous centroid.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


def _d2_exact(vec: Column, centroid: list[float]) -> Column:
    """Exact-decimal squared distance between an array column and a literal
    centroid: round((x-c)^2, 12) per dim, DECIMAL-accumulated."""
    lit = F.array(*[F.lit(float(c)).cast("double") for c in centroid])
    terms = F.zip_with(
        vec,
        lit,
        lambda x, c: F.round(
            (x.cast("double") - c) * (x.cast("double") - c), 12
        ).cast(_DEC),
    )
    return F.aggregate(
        terms, F.lit(0).cast(_DEC), lambda a, v: (a + v).cast(_DEC)
    ).cast("double")


def _assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Append ``cluster`` / ``d2`` = argmin over the k literal centroids
    (ties → smallest centroid id, via struct-min)."""
    entries = [
        F.struct(
            _d2_exact(F.col(vec_col), c).alias("d2"), F.lit(i).alias("cid")
        )
        for i, c in enumerate(centroids)
    ]
    best = F.array_min(F.array(*entries))
    return df.withColumn("d2", best["d2"]).withColumn("cluster", best["cid"])


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
    for _ in range(iters):
        assigned = _assign(df, vec_col, centroids)
        # per-(cluster, dim) decimal means; k*dim rows to the driver
        means = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("dim", "x")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.round(F.col("x").cast("double"), 12).cast(_DEC)).alias(
                    "s"
                ),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cluster",
                "dim",
                (F.col("s").cast("double") / F.col("n").cast("double")).alias(
                    "m"
                ),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        for r in means:
            new[r["cluster"]][r["dim"]] = float(r["m"])
        centroids = new
    return _assign(df, vec_col, centroids), centroids
