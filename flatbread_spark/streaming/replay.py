"""Streaming drain helper + last-batch plan capture (VERDICT r7 #6).

The seven stream-replay queries drain a bounded source with an
``availableNow`` trigger into a memory sink and return a batch frame — so
nothing of the STREAMING physical plan (state-store operators, watermarks,
grouped-pandas-with-state nodes) survives in the returned DataFrame for
``plans/golden.py`` to fingerprint. :func:`drain` stashes the
StreamingQuery handle at drain time; :func:`last_plan` then reads the last
executed micro-batch's physical plan via ``explainInternal`` — the string
the golden's streaming fingerprints are counted from. The registry holds
plain query handles (no Spark resources beyond what the session already
retains for stopped queries) keyed by sink name, latest drain wins.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager

_LAST_QUERY: dict[str, object] = {}

# held for a whole override window: concurrent drains must not interleave
# their set/restore of the session-global conf (the r9 probe-conf race
# lesson — tests/test_advice_r9.py pins the same pattern on graph.py)
_STATE_PARTITIONS_LOCK = threading.Lock()


@contextmanager
def bounded_state_partitions(spark, cap: int = 8):
    """Cap ``spark.sql.shuffle.partitions`` for the span of a bounded
    replay drain (``.start()`` through ``awaitTermination`` — Structured
    Streaming fixes the stateful stage's partition count from this conf
    at query START and records it in the checkpoint, so the override must
    cover planning, not just construction).

    Why (the r10 bench-outlier root cause): a stateful replay over a
    small key space pays PER-PARTITION overhead — a state-store provider
    with its own delta-file commit, plus an Arrow/Python
    ``applyInPandasWithState`` worker round-trip — regardless of how few
    keys land in each partition. At sf0.1 the events replays hold ~1.5k
    keys; 32 partitions means 32 state commits and 32 concurrent Python
    state workers for ~47 keys each, and under host core contention
    those workers serialize badly (BENCH_r09: stream_replay 15.5 s driver
    vs 2.1 s local; measured locally 32→8 partitions halves warm addBatch
    time). Never RAISES the session value (``min(session, cap)``), so
    plan-golden collection under its 4-partition env is unchanged.

    A real deployment replays with its own session conf sized to its key
    space — this cap is for the bounded drains the engine itself runs
    (grading/bench replays), which is why it lives in the entry-query
    layer and not inside the streaming operators.
    """
    key = "spark.sql.shuffle.partitions"
    with _STATE_PARTITIONS_LOCK:
        before = spark.conf.get(key)
        spark.conf.set(key, str(max(1, min(int(before), int(cap)))))
        try:
            yield
        finally:
            spark.conf.set(key, before)


def drain(q, timeout: int = 300):
    """awaitTermination + register the query handle for plan capture."""
    q.awaitTermination(timeout)
    _LAST_QUERY[q.name] = q
    return q


def last_plan(name: str) -> str | None:
    """Physical plan text of the last executed micro-batch of the most
    recently drained query named ``name`` (None if never drained)."""
    q = _LAST_QUERY.get(name)
    if q is None:
        return None
    # explainInternal(extended=False): the formatted physical plan of the
    # last completed execution — available after termination, unlike the
    # active-query-only APIs
    return q._jsq.explainInternal(False)
