"""Rank fusion for hybrid retrieval.

Reciprocal-rank fusion (RRF — Cormack/Clarke/Buettcher's query-fusion
baseline that hybrid search systems still ship) merges rankings produced
by incomparable scorers: BM25 scores and cosine similarities can't be
averaged, but their RANKS can — each list contributes ``1/(k + rank)``
and the fused order is the score sum. The constant ``k`` (conventionally
60) damps the head so one list's #1 can't steamroll consensus.

Exactness contract: each contribution is the INTEGER
``1_000_000 div (k + rank)`` — truncating BIGINT division shared by Spark
``div`` and DuckDB ``//`` — so fused scores are exact integer sums,
byte-identical across engines, and the fused order
``(score desc, id asc)`` is total. The float formulation differs from
this by < 1e-4 relative per term; for training-data retrieval the
integer ladder is the same ordering in practice and is replayable.

Scale shape: a union of top-k lists (each bounded by its producer's k),
one groupBy on the item id, and a rank window per query group — all
bounded by Σ list sizes, never corpus size. The heavy lifting happened
in the producers (BM25 posting join, ANN bucket join); fusion is
count-table algebra over their outputs.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: "Sequence[DataFrame]",
    id_col: str,
    rank_col: str = "rank",
    group_cols: "Sequence[str]" = (),
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse ``rankings`` (each ``(<group_cols...>, id_col, rank_col)``
    with 1-based ranks) into one consensus ranking per group:
    ``rrf_score = Σ_lists 1_000_000 div (k + rank)``. Returns
    ``(<group_cols...>, <id_col>, n_lists, best_rank, rrf_score, rank)``
    ordered by the fused rank — ``n_lists`` (how many lists contained the
    item) and ``best_rank`` (its best input position) carry the usual
    fusion diagnostics.

    ``top_n`` truncates the fused list per group. Input lists may carry
    extra columns (scores); only the declared columns are read.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    if k < 0:
        raise ValueError("rrf_fuse requires k >= 0")
    groups = list(group_cols)
    cols = [*groups, id_col, rank_col]
    parts = [r.select(*cols) for r in rankings]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    contrib = F.expr(
        f"CAST(1000000 AS BIGINT) div (CAST({k} AS BIGINT) "
        f"+ CAST({rank_col} AS BIGINT))"
    )
    fused = (
        allr.withColumn("__c", contrib)
        .groupBy(*groups, id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
            F.min(F.col(rank_col)).cast("bigint").alias("best_rank"),
            F.sum("__c").cast("bigint").alias("rrf_score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*groups).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    out = fused.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    )
    if top_n is not None:
        out = out.filter(F.col("rank") <= int(top_n))
    return out
