#!/usr/bin/env python
"""Registry-wide expensive-filter audit (round 9).

Scans every declared query's physical plan for Filter nodes whose
condition contains an expensive computed expression — a higher-order
function, tokenizer split, md5/hash chain, or sequence build. That is the
signature of Catalyst pushing a predicate below the Project that defines
the computed column (or inferring a join-key isnotnull) and re-evaluating
the whole expression tree per row; in CodegenFallback stages (any plan
with HOFs) there is no subexpression elimination, so the duplicated work
is real wall-time — measured 2x on gate_agreement before the round-9
single-lineage rewrite.

Remedies used in the engine (see SCALE.md "Filter pushback"):
- move the drop inside a Generate: ``explode(when(cond, arr))``
  (operators/spans.py, operators/curation.py);
- :func:`flatbread_spark.plans.barrier.gate_rows` for plain row drops
  over computed columns (operators/ranking.py);
- emit join keys as Generate OUTPUT attributes, not post-explode
  projections (spans._doc_grams);
- drop redundant pre-explode ``size(arr) > 0`` filters — a non-outer
  explode already skips empty arrays.

Usage: python scripts/filter_audit.py [sf_dir]
Exit 0 always; prints FLAG lines. tests/test_filter_audit.py pins the
flagged set to a named allowlist so new regressions fail mechanically.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flatbread_spark.session import get_spark  # noqa: E402

EXPENSIVE = re.compile(
    r"lambdafunction|aggregate\(|transform\(|zip_with|"
    r"regexp_|sentences\(|split\(|md5\(|xxhash64\(|array_sort|sequence\("
)

# Queries whose flagged filters are ACCEPTED, with why. Three classes:
#
# (a) fixture CASEs — the flagged predicate inlines a cheap string CASE
#     that builds the query's own synthetic fixture (variant part names /
#     boilerplate wrappers) over a small dimension table; a handful of
#     concat/substr calls, query-side scaffolding, not operator code:
#     strip_boilerplate. (fuzzy_pairs / name_canonical left this list
#     when the linkage vocab aggregate was pinned — the fixture CASE now
#     sits below the InMemoryTableScan and never re-enters a Filter.)
# (b) filter-only sampling predicates — the hash IS the sampling
#     semantics (deterministic keep/drop); it appears ONLY in the Filter,
#     never in a projection, so nothing is duplicated and the audit's
#     textual heuristic cannot tell: sample_stratified, contamination
#     (the eval-split selection).
# (c) short-input hash join key — contrastive_pairs' inferred
#     isnotnull(md5(vec_id) % B) duplicates one 8-byte-input hash per
#     corpus row, dominated by the bucket join it feeds.
ALLOWED = {
    "strip_boilerplate",
    "sample_stratified",
    "contamination",
    "contrastive_pairs",
}


def flagged_queries(spark, sf_dir: str) -> dict[str, list[str]]:
    hits: dict[str, list[str]] = {}
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        conds = []
        for line in plan.splitlines():
            s = line.strip()
            if "Filter" in s and s.split("Filter", 1)[0].strip(" +-*()0123456789") == "":
                cond = s.split("Filter", 1)[1]
                if EXPENSIVE.search(cond):
                    conds.append(cond[:200])
        if conds:
            hits[name] = conds
    return hits


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    hits = flagged_queries(spark, sf)
    for name, conds in sorted(hits.items()):
        mark = "allowed" if name in ALLOWED else "FLAG"
        print(f"{mark} {name}: {len(conds)} filter(s)")
        for c in conds[:2]:
            print(f"    {c}")
    new = sorted(set(hits) - ALLOWED)
    print(f"\n{len(hits)} total, {len(new)} outside allowlist: {new}")
