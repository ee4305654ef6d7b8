"""SparkSession factory with the engine's recommended scale settings.

local[N] for tests/bench; on a real cluster the same config block applies —
AQE handles runtime re-planning (skew joins, partition coalescing), and
Arrow batches every pandas-UDF boundary.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession

_INFER_GENERATE_RULE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def _excluded_rules(infer_generate_filters: bool) -> str:
    """The optimizer exclusion list for a new session. Kept as a helper so
    the escape hatch's wiring is unit-testable without building a session
    (``getOrCreate`` would ignore the config on an existing one — callers
    flipping an ALREADY-RUNNING session set the conf directly; it is
    runtime-mutable)."""
    return "" if infer_generate_filters else _INFER_GENERATE_RULE


def get_spark(
    app: str = "flatbread-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    infer_generate_filters: bool = False,
) -> SparkSession:
    """``infer_generate_filters=True`` keeps Catalyst's
    ``InferFiltersFromGenerate`` rule enabled (VERDICT r9 #6 scope guard).
    The engine excludes it by default because every DECLARED query's
    Generate sits directly on the scan stage, where the inferred
    ``size(arr)>0`` predicate only re-evaluates the expensive generator
    expression per row (measured 12-27% on the chunk/shingle family) — a
    perf-only exclusion, value-invariant (pinned by
    ``tests/test_infer_generate_invariance.py``). But the exclusion is
    session-global and this is a library: a USER-composed plan with a
    Generate above a join can genuinely benefit from the inferred filter
    pruning rows before the exchange — pass ``True`` there, or flip the
    live session with ``spark.conf.set("spark.sql.optimizer.excludedRules",
    "")`` (the conf is runtime-mutable)."""
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
        # Escape hatch: infer_generate_filters=True for user-composed
        # plans with a Generate above a join (see docstring).
        .config(
            "spark.sql.optimizer.excludedRules",
            _excluded_rules(infer_generate_filters),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
