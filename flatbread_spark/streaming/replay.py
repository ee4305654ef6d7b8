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

_LAST_QUERY: dict[str, object] = {}


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
