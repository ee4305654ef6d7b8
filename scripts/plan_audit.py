#!/usr/bin/env python
"""Physical-plan audit CLI: print scale-relevant plan facts for every
declared query (or a subset) without executing it. Core logic lives in
``flatbread_spark.plans`` — see that module's docstring for what each fact
means and which ones are red flags.

    python scripts/plan_audit.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flatbread_spark.plans import plan_facts, plan_flags  # noqa: E402
from flatbread_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app="plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            facts = plan_facts(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        flags = plan_flags(facts)
        line = " ".join(f"{k}={v}" for k, v in facts.items() if v)
        print(f"{name}: {line}{('  !! ' + ','.join(flags)) if flags else ''}")


if __name__ == "__main__":
    main()
