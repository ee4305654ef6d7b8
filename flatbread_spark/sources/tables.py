"""Source readers.

The reference has no file readers (in-memory pandas only — SURVEY §2.2); the
engine exposes Spark's native scans so Catalyst gets predicate pushdown,
column pruning and partition pruning for free. ``load_table`` is the thin
convention wrapper over the driver testdata layout (one parquet per table).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out
