"""SparkSession factory with the engine's recommended scale settings.

local[N] for tests/bench; on a real cluster the same config block applies —
AQE handles runtime re-planning (skew joins, partition coalescing), and
Arrow batches every pandas-UDF boundary.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "flatbread-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS) which Spark rejects by default;
        # read as BIGINT nanoseconds and convert explicitly where needed
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate re-adds a size(arr)>0/isnotnull filter
        # below every non-outer explode; project collapse then inlines the
        # full generator-child expression into that predicate, so an
        # expensive chunk/shingle HOF array is computed TWICE per row. The
        # engine's generates all sit directly on the scan stage (nothing to
        # prune before an exchange), and a non-outer Generate already skips
        # empty/NULL arrays row-locally — the inferred filter is pure cost
        # here (measured 12-27% on the chunk/shingle query family).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
