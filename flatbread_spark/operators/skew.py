"""Skew mitigation: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one dominant language, an empty-string
group, a viral document) turn a groupBy/join into a single straggler task.
Spark's AQE skew-join handles sort-merge joins at runtime; these helpers
cover the remaining cases explicitly:

- ``salted_agg``: two-stage aggregation — stage 1 groups by (key, salt) so a
  hot key's rows spread over ``n_salts`` tasks and combine map-side; stage 2
  merges the per-salt partials. Works for any algebraic aggregate given its
  (partial, merge) pair; sums/counts/min/max merge with themselves.
- ``salt_explode_join``: broadcast-unfriendly dim joined against a skewed
  fact: fact side gets a random-but-deterministic salt in [0, n); dim side is
  exploded n× (one row per salt) so the equi-join key becomes (key, salt) and
  the hot key's matches spread across n partitions.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt__"


def _fact_salt(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic pseudo-random salt in [0, n_salts): hash of the full row
    keys (stable across retries, unlike rand())."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name → (stage1 aggregate over input columns,
    stage2 aggregate over the stage-1 column of that name). Example::

        salted_agg(df, ["lang"], {
            "n":   (F.count(F.lit(1)), F.sum("n")),
            "tot": (F.sum("value"),    F.sum("tot")),
        })
    """
    keys = list(keys)
    salt_cols = list(salt_on) if salt_on is not None else list(df.columns)
    salted = df.withColumn(SALT, _fact_salt(salt_cols, n_salts))
    partial = salted.groupBy(*keys, SALT).agg(
        *[e.alias(name) for name, (e, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def salt_explode_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows salted, dim rows replicated n_salts×,
    join on (keys + salt). Semantically identical to ``fact.join(dim, on,
    how)`` for inner/left joins on unique dim keys."""
    on = list(on)
    f = fact.withColumn(SALT, _fact_salt(list(fact.columns), n_salts))
    d = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT, F.col(SALT).cast("int"))
    return f.join(d, on + [SALT], how).drop(SALT)
