"""Declarative data-quality validation: constraint rules → one-scan report.

Every corpus refresh should be gated on invariants (ids present and unique,
enum columns in range, lengths sane) BEFORE expensive downstream stages run.
The naive form — one ``df.filter(...).count()`` per rule — scans the corpus
once per rule. :func:`validate_constraints` compiles all ROW-LOCAL rules
into a single aggregate pass (each rule is a conditional count inside one
``agg`` — one scan total, no shuffle beyond the final partial-agg merge),
and uniqueness rules into one hash aggregate per distinct key-set (the only
rules that fundamentally need a shuffle; duplicate count = rows − distinct
keys, computed without materializing groups).

Rules (all constructors return plain dicts — serializable, loggable):

- ``not_null(col)`` — NULL values violate.
- ``unique(*cols)`` — rows beyond the first per key violate; NULL key
  fields compare as values (NULL == NULL), via distinct-count over the
  never-null struct of the key columns.
- ``accepted_values(col, values)`` — non-null values outside the list
  violate (NULLs are not_null's job — composable rules stay orthogonal).
- ``in_range(col, lo, hi)`` — non-null values outside [lo, hi] violate.
- ``matches_regex(col, pattern)`` — non-null values not matching violate.
- ``satisfies(name, predicate)`` — escape hatch: rows where the boolean
  Column is not definitively TRUE violate (a NULL predicate — e.g. a
  comparison over a NULL field — counts as a violation: unknown fails the
  gate, the conservative choice for a release gate; wrap the predicate in
  ``coalesce`` to opt out).

Report: one row per rule — ``rule, kind, n_violations, passed`` — bounded
by the rule list, never the data. All counts are BIGINT (hash-stable).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> dict:
    return {"kind": "not_null", "col": col, "rule": f"not_null({col})"}


def unique(*cols: str) -> dict:
    return {
        "kind": "unique",
        "cols": list(cols),
        "rule": f"unique({', '.join(cols)})",
    }


def accepted_values(col: str, values: Sequence) -> dict:
    return {
        "kind": "accepted_values",
        "col": col,
        "values": list(values),
        "rule": f"accepted_values({col})",
    }


def in_range(col: str, lo, hi) -> dict:
    return {
        "kind": "in_range",
        "col": col,
        "lo": lo,
        "hi": hi,
        "rule": f"in_range({col})",
    }


def matches_regex(col: str, pattern: str) -> dict:
    return {
        "kind": "matches_regex",
        "col": col,
        "pattern": pattern,
        "rule": f"matches_regex({col})",
    }


def satisfies(name: str, predicate: Column) -> dict:
    return {"kind": "satisfies", "predicate": predicate, "rule": name}


def _violation_expr(r: dict) -> Column:
    kind = r["kind"]
    if kind == "not_null":
        return F.col(r["col"]).isNull()
    if kind == "accepted_values":
        c = F.col(r["col"])
        return c.isNotNull() & ~c.isin(*r["values"])
    if kind == "in_range":
        c = F.col(r["col"])
        return c.isNotNull() & ((c < F.lit(r["lo"])) | (c > F.lit(r["hi"])))
    if kind == "matches_regex":
        c = F.col(r["col"])
        return c.isNotNull() & ~c.rlike(r["pattern"])
    if kind == "satisfies":
        return ~F.coalesce(r["predicate"], F.lit(False))
    raise ValueError(f"unknown rule kind: {kind}")


def validate_constraints(df: DataFrame, rules: Sequence[dict]) -> DataFrame:
    """Evaluate every rule and return ``rule, kind, n_violations, passed``
    in the order given. See module docstring for the scan/shuffle budget:
    one corpus scan for all row-local rules + one hash aggregate per
    distinct ``unique`` key-set."""
    rules = list(rules)
    names = [r["rule"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    spark = df.sparkSession
    row_local = [r for r in rules if r["kind"] != "unique"]
    uniq = [r for r in rules if r["kind"] == "unique"]

    reports = []
    if row_local:
        aggs = [
            F.sum(_violation_expr(r).cast("long")).alias(f"v{i}")
            for i, r in enumerate(row_local)
        ]
        counts = df.agg(*aggs)
        # one row in, len(rules) rows out: stack the aggregate row —
        # stays a single scan because every conditional count shares it.
        # F.stack (not an expr string) so rule names need no SQL quoting.
        stacked = []
        for i, r in enumerate(row_local):
            stacked += [
                F.lit(r["rule"]),
                F.coalesce(F.col(f"v{i}"), F.lit(0)).cast("long"),
            ]
        reports.append(
            counts.select(
                F.stack(F.lit(len(row_local)), *stacked).alias(
                    "rule", "n_violations"
                )
            )
        )
    for r in uniq:
        # duplicates = rows − distinct key TUPLES. count_distinct on bare
        # columns would skip null-keyed rows; the struct wrapper is never
        # null, so NULL key fields compare as values (NULL == NULL here)
        dup = df.agg(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in r["cols"]]))
            ).alias("n_violations")
        ).select(F.lit(r["rule"]).alias("rule"), "n_violations")
        reports.append(dup)

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    dim = spark.createDataFrame(
        [(i, r["rule"], r["kind"]) for i, r in enumerate(rules)],
        "idx int, rule string, kind string",
    )
    return (
        dim.join(out, "rule", "left")
        .orderBy("idx")
        .select(
            "rule",
            "kind",
            F.coalesce("n_violations", F.lit(0)).cast("bigint").alias(
                "n_violations"
            ),
            (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
        )
    )
