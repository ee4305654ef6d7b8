"""Pushdown-barrier helpers.

Catalyst pushes deterministic Filters below Projects, substituting the
projected expression trees into the predicate. That is the right call when
the filter prunes a scan, and exactly wrong when the filtered column is an
EXPENSIVE computed expression (tokenizer arrays, hashed features, HOF
chains): the pushed predicate re-evaluates the whole tree per row on top
of the projection's own copy — and in CodegenFallback stages (any plan
with higher-order functions) there is no subexpression elimination to
save you. Measured 2x wall on real queries (see operators/curation.py
rater_agreement and the round-9 SCALE.md note).

:func:`gate_rows` is the non-pushable row filter for those sites: the
predicate is wrapped in a one-element ``explode(when(cond, array(0)))``.
A non-outer Generate emits the row exactly once when the condition holds
and drops it otherwise, and Catalyst never pushes predicates below a
Generate it cannot prove independent — the computed columns stay
materialized exactly once. Cost: one Generate node over a 1-int array
(row-local, no shuffle, negligible next to a duplicated tokenizer).

Use a plain ``.filter`` when the predicate touches only scan columns —
pushdown is then a pure win (predicate reaches the parquet reader).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gate_rows(df: DataFrame, cond: Column) -> DataFrame:
    """Keep rows where ``cond`` is true (NULL counts as false), WITHOUT
    letting the predicate be pushed below upstream projections.

    Semantically identical to ``df.filter(cond)``; use when ``cond``
    references expensive computed columns that a pushed-down copy would
    re-evaluate per row.
    """
    gate = F.explode(F.when(cond, F.array(F.lit(0)))).alias("__gate__")
    return df.select("*", gate).drop("__gate__")
