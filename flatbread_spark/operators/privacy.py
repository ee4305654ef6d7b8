"""Privacy-risk audits for release gating.

Before a derived dataset ships, governance asks two questions this module
answers exactly: how re-identifiable are rows from their quasi-identifiers
(k-anonymity — the smallest equivalence class bounds the linkage risk),
and do small classes leak their sensitive attribute outright (l-diversity
— a class where everyone shares one sensitive value reveals it even at
k ≥ threshold). Both reduce to count-table algebra over the
quasi-identifier grouping: one partial-aggregated shuffle bounded by the
distinct QI combinations, then a bounded summary — the same scale shape
as every vocabulary audit in this repo, and every number is an exact
BIGINT.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    quasi_cols: "Sequence[str]",
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity / l-diversity audit over ``quasi_cols``: group rows by
    their quasi-identifier combination and summarize the equivalence-class
    sizes — ``min_class`` IS the dataset's k; ``n_rows_below_k`` is how
    many rows fail the ``k`` policy (the rows a suppression/generalization
    pass must fix). With ``sensitive_col``, classes whose sensitive
    attribute takes a single value are counted as ``n_homogeneous`` —
    l-diversity's l=1 failure, a disclosure even when the class is large.

    Returns ONE row: ``(n_rows, n_classes, min_class, max_class,
    n_below_k_classes, n_rows_below_k[, n_homogeneous])``.
    """
    qcols = list(quasi_cols)
    if not qcols:
        raise ValueError("k_anonymity requires at least one quasi column")
    if k < 1:
        raise ValueError("k_anonymity requires k >= 1")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).cast("bigint")
            .alias("__s")
        )
    classes = df.groupBy(*qcols).agg(*aggs)
    out = [
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__n").cast("bigint").alias("min_class"),
        F.max("__n").cast("bigint").alias("max_class"),
        F.sum((F.col("__n") < k).cast("int")).cast("bigint")
        .alias("n_below_k_classes"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_below_k"),
    ]
    if sensitive_col is not None:
        out.append(
            F.sum((F.col("__s") == 1).cast("int")).cast("bigint")
            .alias("n_homogeneous")
        )
    return classes.agg(*out)
