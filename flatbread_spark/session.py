"""SparkSession factory with the engine's recommended scale settings.

local[N] for tests/bench; on a real cluster the same config block applies —
AQE handles runtime re-planning (skew joins, partition coalescing), and
Arrow batches every pandas-UDF boundary.
"""
from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession

# held for the whole override window: concurrent internal actions must not
# interleave their set/restore of the session-global conf (same discipline
# as streaming.replay.bounded_state_partitions — the r9 probe-conf race)
_NO_AQE_LOCK = threading.RLock()


@contextmanager
def no_adaptive_execution(spark: SparkSession):
    """Run a library-INTERNAL action without AQE's stage-by-stage job
    splitting (VERDICT r10 #2, the multi-job contention amplifier).

    AQE executes every query as a chain of separate JOBS (one per
    materialized query stage), each paying fixed scheduler + task-launch
    overhead — the right trade for user plans whose joins it re-plans at
    runtime, pure cost for the engine's own two-phase machinery actions
    (range-rank stats collects, checkpoint materializations): their plans
    are shapes the library fixed at write time — no joins to re-plan, and
    AQE never coalesces a user-specified ``repartitionByRange`` exchange
    anyway (only ENSURE_REQUIREMENTS/rebalance origins). Measured on
    quantile_buckets at sf0.01: 12 jobs → 4 with this guard plus the
    lazy-checkpoint fold (ranking.two_phase_offset).

    Restore-on-error, never leaks: the caller's OWN queries (which may
    join, and deserve AQE) execute outside the window. Reentrant lock so
    nested two-phase calls (weighted_percentiles → cumsum → rank) don't
    deadlock."""
    key = "spark.sql.adaptive.enabled"
    with _NO_AQE_LOCK:
        before = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            spark.conf.set(key, before)

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
    prefer_sort_merge_join: bool = False,
) -> SparkSession:
    """``prefer_sort_merge_join=True`` restores Spark's default join
    preference (ADVICE r11 #1 escape hatch). The engine default lets the
    planner pick shuffled-hash join when its size gates hold (guide §3.1
    and the guide's §9 reference configuration ship exactly this
    setting); the risk envelope is documented at the config line below
    and pinned by ``tests/test_shj_envelope_r12.py`` — a deployment whose
    statistics are unreliable (SHJ's per-partition build map OOMs where
    SMJ would spill) passes ``True`` here or flips the runtime-mutable
    ``spark.sql.join.preferSortMergeJoin`` on the live session.

    ``infer_generate_filters=True`` keeps Catalyst's
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
        # guide §3.1/§9: let the planner pick shuffled-hash join when its
        # size conditions hold (build side under autoBroadcastJoinThreshold
        # × shuffle partitions AND much smaller than the probe side) — SHJ
        # skips both sort passes of SMJ. NOT a local[32] tune: the planner's
        # own size gates govern at any scale, and two 100 TB sides fail
        # them and fall back to sort-merge exactly as before. Measured on
        # the join-heavy 16-query bench subset at sf0.1: 31.3 → 26.9 s
        # (−14%), no query slower beyond noise (OPTIMIZATION_r11.md).
        # RISK ENVELOPE (ADVICE r11 #1): SHJ builds a per-partition hash
        # map and cannot spill the build side, so a badly mis-estimated
        # build under memory pressure OOMs where SMJ would spill. The
        # planner only picks SHJ when the build side estimates under
        # autoBroadcastJoinThreshold × shufflePartitions AND 3× smaller
        # than the probe; tests/test_shj_envelope_r12.py pins exactly
        # which declared queries plan one (all with vocabulary-/gate-
        # bounded build sides), so a new SHJ site fails review
        # mechanically. prefer_sort_merge_join=True restores the Spark
        # default for stat-unreliable deployments.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            str(bool(prefer_sort_merge_join)).lower(),
        )
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
