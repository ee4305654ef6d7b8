#!/usr/bin/env python
"""Dump ``explain("formatted")`` for declared queries to text files.

    python scripts/dump_explain.py --repo PATH --sf SF_DIR --out DIR \
        --suffix before|after QUERY [QUERY ...]

Used to produce the ``plans/r11/<query>_{before,after}.txt`` deliverables:
run once with ``--repo`` pointing at the pre-round worktree (suffix
``before``) and once at HEAD (suffix ``after``). The explain is taken on
the exact DataFrame the registry returns, under the bench session shape
(local[$SPARK_GRAFT_CPUS], shuffle_partitions = cpus), so Exchange counts
and join strategies in the files match what the bench executes. Queries
whose build function runs internal actions (two-phase rank stats,
pagerank iterations, stream drains) execute those while building — the
files still capture the plan of the RETURNED frame, which is what the
timed ``collect()`` executes.
"""
from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, os.path.abspath(args.repo))
    import __spark_entry__ as entry
    from flatbread_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app="dump-explain",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    qs = entry.queries()
    for name in args.queries:
        if name not in qs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
