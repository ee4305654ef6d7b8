"""Mechanical enforcement of the stale-first grading rotation (the round-8
ordering contract in ``__spark_entry__.queries()``).

The driver grades a bounded prefix of the registry each round; the
contract says the registry is re-sorted every round by
round-of-most-recent-driver-grade ASCENDING (never-graded = oldest), with
at most two warm-up leads exempt, so the maximum grade age stays bounded
at ~len(registry)/window rounds.

ROTATION_BASIS is the frozen list of CORRECTNESS files the CURRENT
ordering was derived from — when a new round's CORRECTNESS_r{N}.json
lands, add it here and re-sort the registry; this test then fails until
the rotation is actually performed, which is the point.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The round-12 ordering was computed from rounds 1-11 (everything graded
# before this round). Append CORRECTNESS_r12.json + re-sort in round 13.
ROTATION_BASIS = [f"CORRECTNESS_r0{r}.json" for r in range(1, 10)] + [
    "CORRECTNESS_r10.json",
    "CORRECTNESS_r11.json",
]

# Cheap stale leads allowed out of order to absorb JVM JIT + Arrow-worker
# cold start (must still come from the stalest cohort — asserted below).
WARMUP_LEADS = 2


def _last_grade_rounds():
    last = {}
    for i, fname in enumerate(ROTATION_BASIS, start=1):
        path = os.path.join(REPO, fname)
        with open(path) as f:
            for q in json.load(f):
                last[q] = i
    return last


def test_registry_is_stale_first_under_the_rotation_basis():
    last = _last_grade_rounds()
    names = list(entry.queries())
    ages = [last.get(n, 0) for n in names]  # never-graded -> 0 (stalest)
    body = ages[WARMUP_LEADS:]
    violations = [
        (names[WARMUP_LEADS + i], body[i], names[WARMUP_LEADS + i + 1], body[i + 1])
        for i in range(len(body) - 1)
        if body[i] > body[i + 1]
    ]
    assert not violations, (
        "queries() violates the stale-first rotation (pairs out of order, "
        f"basis={ROTATION_BASIS[-1]}): {violations[:5]} — re-sort the "
        "registry by last-grade round ascending and update ROTATION_BASIS"
    )
    # the warm-up leads must themselves come from the stalest GRADED
    # cohort — their slots still re-grade stale queries (never-graded
    # queries can't lead: their cost is unknown, and they belong at the
    # head of the body where the test above already forces them)
    graded = [a for a in ages if a > 0]
    stalest_graded = min(graded) if graded else 0
    assert all(a == stalest_graded for a in ages[:WARMUP_LEADS])


def test_every_declared_query_has_been_driver_graded():
    """Backlog stays zero: every registry entry appears in some
    CORRECTNESS file of the rotation basis, except queries added THIS
    round (which must sit at the front of the body, where the next
    window grades them first)."""
    last = _last_grade_rounds()
    names = list(entry.queries())
    never = [n for n in names if n not in last]
    if never:
        body = names[WARMUP_LEADS:]
        head = body[: len(never)]
        assert set(never) <= set(head), (
            f"never-graded queries must lead the rotation body: {never}"
        )
