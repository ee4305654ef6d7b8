"""Tracked per-query plan-fingerprint golden (VERDICT r6 #2).

``plan_facts`` counts are asserted as booleans by the per-family plan
tests; this module pins the EXACT counts for every declared query in a
committed snapshot (``plans_golden.json``) so that any edit that changes a
query's physical shape — one more Exchange, a BroadcastHashJoin that
degraded to SortMergeJoin, a new Arrow boundary, a dropped cache — fails
``tests/test_plan_golden.py`` mechanically with a per-fact diff, instead
of surfacing rounds later as a bench regression.

Determinism contract: fingerprints are only comparable under one fixed
environment, pinned in ``GOLDEN_ENV`` (the test-session config: local[4],
4 shuffle partitions, the sf0.001 tables — AQE's initial plan, broadcast
threshold decisions, and partition counts are all functions of these).
``spark.catalog.clearCache()`` runs before every query so a fingerprint
never depends on which query built its plan first; queries whose
construction DRAINS a stream (the replay harnesses) are excluded because
their batch result plan is a trivial LocalTableScan with no structure to
pin.

Regenerate DELIBERATELY after a plan-shape change you intend:

    python scripts/plan_audit.py --write-golden

and review the diff in the commit — the review is the point.
"""
from __future__ import annotations

import os

from flatbread_spark.plans.audit import plan_facts

GOLDEN_ENV = {
    "master": "local[4]",
    "shuffle_partitions": 4,
    "sf_dir": "/root/testdata/sf0.001",
}
GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "plans_golden.json",
)

# Stream-replay harnesses: building the result DataFrame executes the
# micro-batch drain and returns an in-memory batch frame — nothing of the
# streaming plan survives in the RETURNED frame, so the batch collector
# excludes them. Their micro-batch physical plans are fingerprinted
# separately (VERDICT r7 #6) by collect_streaming_fingerprints below:
# the drain helper stashes each StreamingQuery handle, and the last
# executed batch's plan (explainInternal) is counted against the
# state-layout node set in plans/audit.STREAM_MARKS.
# Tags under which __spark_entry__ pins frames (cache.pin(..., tag=...)).
# collect_fingerprints releases exactly these between queries — the entry
# module's memoized persisted frames are the only ones whose ALREADY-
# EXECUTED plans survive clearCache() and would leak InMemoryTableScan
# nodes into later fingerprints.
ENTRY_PIN_TAGS = ("knn_recall", "ivf_sweep")

SKIP = {
    "stream_replay",
    "stream_dedup_replay",
    "stream_quality_gate",
    "stream_topk",
    "stream_upsert",
    "stream_drift",
    "stream_rate_anomaly",
}

# streaming query name -> its memory-sink queryName (the key the drain
# helper registers the StreamingQuery handle under)
STREAM_SINKS = {
    "stream_replay": "fb_stream_replay",
    "stream_dedup_replay": "fb_stream_dedup",
    "stream_quality_gate": "fb_stream_gate",
    "stream_topk": "fb_stream_topk",
    "stream_upsert": "fb_stream_upsert",
    "stream_drift": "fb_stream_drift",
    "stream_rate_anomaly": "fb_stream_rate",
}


def collect_streaming_fingerprints(
    spark, verbose: bool = False
) -> dict[str, dict[str, int]]:
    """Micro-batch plan facts for the 7 streaming queries under GOLDEN_ENV.

    Running each entry query drains its bounded stream (availableNow — one
    deterministic pass over the same files each time); the fingerprint is
    counted from the LAST executed micro-batch's physical plan. The node
    COUNTS are layout-stable: state-store save/restore pairs, watermark
    nodes, and pandas-with-state kernels are per-operator constants of the
    query shape, not of batch slicing."""
    import __spark_entry__ as _entry

    from flatbread_spark.plans.audit import streaming_plan_facts
    from flatbread_spark.streaming.replay import last_plan

    qs = _entry.queries()
    out: dict[str, dict[str, int]] = {}
    for name, sink in STREAM_SINKS.items():
        qs[name](spark, GOLDEN_ENV["sf_dir"])  # build + drain
        plan = last_plan(sink)
        if plan is None:  # drain failed loudly upstream; record emptiness
            raise RuntimeError(f"no streaming plan captured for {name}")
        out[name] = streaming_plan_facts(plan)
        if verbose:
            line = " ".join(f"{k}={v}" for k, v in out[name].items() if v)
            print(f"{name}: {line}")
    return out


def collect_fingerprints(spark, verbose: bool = False) -> dict[str, dict[str, int]]:
    """Plan facts for every declared non-streaming query under GOLDEN_ENV.

    The caller is responsible for providing a session whose master /
    shuffle-partition config matches ``GOLDEN_ENV`` — fingerprints taken
    under any other config are not comparable to the tracked golden.
    """
    # Deferred import: the entry module lives at the repo root (driver
    # contract), outside the package — the library proper must not depend
    # on it at import time.
    import __spark_entry__ as _entry

    from flatbread_spark.cache import release

    out: dict[str, dict[str, int]] = {}
    for name, fn in _entry.queries().items():
        if name in SKIP:
            continue
        # Scoped cache-state reset, not just clearCache(): the entry module
        # memoizes the shared bruteforce baseline (_BF_CACHE) as an
        # ALREADY-EXECUTED persisted DataFrame, whose memoized physical
        # plan keeps its InMemoryTableScan even after clearCache() — so a
        # fingerprint taken after any test/query that warmed the memo
        # would read cached=1 while a fresh session reads 0. Dropping the
        # memo (and unpinning ONLY the tags the entry module pins — ADVICE
        # r7: an untagged release() would unpersist every pinned frame
        # session-wide, silently un-caching dedup bases and worker-pool
        # frames other tests still hold) makes every fingerprint the
        # fresh-session one without touching unrelated pins.
        _entry._BF_CACHE.clear()
        for _tag in ENTRY_PIN_TAGS:
            release(tag=_tag)
        spark.catalog.clearCache()
        out[name] = plan_facts(fn(spark, GOLDEN_ENV["sf_dir"]))
        if verbose:
            line = " ".join(f"{k}={v}" for k, v in out[name].items() if v)
            print(f"{name}: {line}")
    spark.catalog.clearCache()
    return out
