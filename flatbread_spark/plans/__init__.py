"""Physical-plan inspection helpers.

The repeatable form of the "is this the plan I'd want at 100 TB" check:
count scale-relevant facts off a DataFrame's ``executedPlan`` (post-AQE
initial planning) without executing it — shuffles, join strategies,
codegen spans, Arrow/Python boundaries, and the red-flag operators
(CartesianProduct / BroadcastNestedLoopJoin / single-partition exchanges).

``scripts/plan_audit.py`` drives this over every declared query.
"""
from flatbread_spark.plans.audit import RED_FLAGS, plan_facts, plan_flags

__all__ = ["plan_facts", "plan_flags", "RED_FLAGS"]
