"""Mechanical guard for the round-9 expensive-filter audit.

Catalyst pushes deterministic Filters below Projects (and infers join-key
isnotnull filters), inlining computed expression trees into the predicate
— with higher-order functions in the plan the stage is CodegenFallback
(no subexpression elimination), so a tokenizer / hash / HOF array gets
evaluated TWICE per row. Measured 2x wall on gate_agreement before the
round-9 fixes. This test re-runs scripts/filter_audit.py's scan over the
full declared registry at sf0.001 and fails if any query outside the
documented allowlist has an expensive expression inside a Filter node —
the same fail-mechanically discipline as the plan golden.
"""
from scripts.filter_audit import ALLOWED, flagged_queries


def test_no_expensive_filters_outside_allowlist(spark):
    hits = flagged_queries(spark, "/root/testdata/sf0.001")
    new = sorted(set(hits) - ALLOWED)
    detail = {n: hits[n][:1] for n in new}
    assert not new, (
        "queries with an expensive computed expression inside a Filter "
        f"(pushed-down duplicate evaluation — see plans/barrier.py): {detail}"
    )
    # the allowlist must not go stale: every allowed name still flags
    stale = sorted(ALLOWED - set(hits))
    assert not stale, f"allowlist entries no longer flagged — remove: {stale}"
