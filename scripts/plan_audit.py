#!/usr/bin/env python
"""Physical-plan audit: print scale-relevant plan facts for every declared
query (or a subset) without executing it.

    python scripts/plan_audit.py [sf_dir] [query ...]

Facts per query (read off ``executedPlan`` after AQE initial planning):

- parquet scans and InMemoryTableScan (cache) reads; when ``cached`` > 0
  the parquet count includes the cached relation's PRINTED lineage — each
  cache reference re-prints the plan beneath it, but only the first
  materialization executes a real scan
- Exchange count (shuffles) and whether any is a single-partition sort
- BroadcastHashJoin count vs SortMergeJoin count
- WholeStageCodegen span count (JVM hot path) vs Arrow/Python evaluation
  nodes (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas)
- CartesianProduct / BroadcastNestedLoopJoin — red flags unless the build
  side is a 1-row scalar frame

The audit is the repeatable form of the "is this the plan I'd want at
100 TB" check: no unexpected cartesians, no unpartitioned windows on scale
paths, Python only at Arrow boundaries.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flatbread_spark.session import get_spark  # noqa: E402

MARKS = [
    ("scans", r"Scan parquet"),
    ("cached", r"InMemoryTableScan"),
    ("exchanges", r"Exchange "),
    ("single_part", r"SinglePartition"),
    ("bcast_join", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("codegen", r"\*\(\d+\)"),
    ("arrow_eval", r"ArrowEvalPython"),
    ("grouped_pandas", r"FlatMapGroupsInPandas"),
    ("map_pandas", r"MapInPandas"),
    ("cartesian", r"CartesianProduct"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app="plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        facts = {k: len(re.findall(p, plan)) for k, p in MARKS}
        flags = []
        if facts["cartesian"]:
            flags.append("CARTESIAN")
        if facts["bnlj"]:
            flags.append("BNLJ")  # fine for 1-row scalar frames, else a red flag
        line = " ".join(f"{k}={v}" for k, v in facts.items() if v)
        print(f"{name}: {line}{('  !! ' + ','.join(flags)) if flags else ''}")


if __name__ == "__main__":
    main()
