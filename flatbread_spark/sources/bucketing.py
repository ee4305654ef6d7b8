"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem) or a
repeated groupBy on the same key is the exchange. Writing both sides
bucketed by the join key (`bucketBy` + `sortBy`) lets Spark's planner drop
the Exchange entirely — each bucket pair joins locally. The write costs one
shuffle ONCE; every subsequent join/agg on the bucket key is shuffle-free.

Local verification (tests/test_bucketing.py) asserts the bucketed join plan
contains no Exchange on the bucketed sides, the property this module exists
to deliver.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table (parquet).

    ``n_buckets`` should divide evenly into cluster cores and keep each
    bucket under a few hundred MB at the target scale; both join sides must
    use the SAME bucket count and columns for the exchange to be removable.
    """
    bucket_cols = list(bucket_cols)
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(list(sort_cols) if sort_cols else bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    SortMergeJoin over bucketed scans with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
