#!/usr/bin/env python
"""sf1 spot-bench (VERDICT r11 #1/#5): restore an empirical SCALE signal.

The driver bench's sf0.1 is too small to exercise parallelism (the r11
suite ran FASTER at 8 cores than 32 — per-job fixed overhead dominates),
so scale claims rested on plan audits alone. This script materializes a
10× "sf1-like" dataset from the read-only sf0.1 parquet — deterministic,
derived, NEVER replacing the driver data — then times a fixed top-N
query subset ONE pass each, and writes a separate JSON file. Entirely
ADDITIVE: bench.py, its methodology and its JSON contract are untouched.

Scaling recipe (seedless, replayable):
- lineitem/orders: 10 copies with shifted l_orderkey/o_orderkey (copy i
  adds i*OFF); FK columns (custkey/partkey/suppkey) unchanged — joins
  stay valid, per-key fan-out grows 10x (the realistic direction).
- events: shifted event_id; user_id/session keys unchanged (10x denser
  activity per user); ts unchanged (10x rows per hour bucket).
- documents: copy i prefixes i salt tokens (the scale_probe convention —
  DELIBERATELY near-dup-adversarial: each source doc becomes a 10-way
  near-dup cluster, stressing the banding joins).
- embeddings: copy i rotates the vector left by i positions — distinct
  directions, so ANN/LSH candidate densities stay realistic instead of
  exploding on exact duplicates.
- dimension tables copied as-is.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/sf1_spot_bench.py [--gen-only] \
        [--out FILE] [query ...]

Data lands in $SF1_DIR (default /tmp/fb_sf1). Generation is idempotent
(skips tables whose parquet already exists). Output: one JSON line
{"sf": "sf1-synthetic", "cpus": N, "queries": {...}, "total": T}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SF1_DIR", "/tmp/fb_sf1")
COPIES = int(os.environ.get("SF1_COPIES", "10"))
OFF = 100_000_000

# top steady-state queries of the r11/r12 benches (batch + streaming),
# covering every expensive operator family: graph, interval/range joins,
# minhash/banding, exact-cosine ANN, sketches, rank machinery, text
# kernels, streaming drains
DEFAULT_QUERIES = [
    "degree_spectrum", "pagerank", "interval_join", "minhash_incremental",
    "triangle_count", "contrastive_pairs", "stream_rate_anomaly",
    "knn_quantized_recall", "gate_agreement", "coreset_fps",
    "knn_quantized", "cms_frequency", "lang_segments",
    "embedding_contamination", "hot_spans", "quantile_contract",
    "quality_classifier", "dedup_clusters", "stream_drift",
    "semantic_dedup",
]


def _gen(spark):
    import pyspark.sql.functions as F

    os.makedirs(DST, exist_ok=True)

    def done(name):
        return os.path.isfile(os.path.join(DST, name + ".parquet"))

    def write(df, name):
        # single parquet FILE per table, matching the driver testdata
        # layout — the streaming queries symlink <dir>/<table>.parquet
        # into their stream source dir, and a directory symlink there
        # lists zero files (the file stream source does not recurse)
        import glob
        import shutil

        tmp = os.path.join(DST, "_tmp_" + name)
        # 1 MB row groups keep the single file SPLITTABLE even for the
        # small compressed text/vector tables — a default 128 MB row group
        # capped every fact scan at ONE task regardless of core count
        (df.coalesce(1).write.mode("overwrite")
         .option("parquet.block.size", 1024 * 1024).parquet(tmp))
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(DST, name + ".parquet"))
        shutil.rmtree(tmp)
        print(f"# generated {name}", flush=True)

    def copies(df, build):
        parts = [build(df, 0)]
        for i in range(1, COPIES):
            parts.append(build(df, i))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for name in ("region", "nation", "customer", "supplier", "part"):
        if not done(name):
            write(spark.read.parquet(os.path.join(SRC, name + ".parquet")), name)

    if not done("lineitem"):
        li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
        write(copies(li, lambda d, i: d.withColumn(
            "l_orderkey", (F.col("l_orderkey") + F.lit(i * OFF)).cast("long"))),
            "lineitem")
    if not done("orders"):
        o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
        write(copies(o, lambda d, i: d.withColumn(
            "o_orderkey", (F.col("o_orderkey") + F.lit(i * OFF)).cast("long"))),
            "orders")
    if not done("events"):
        ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
        write(copies(ev, lambda d, i: d.withColumn(
            "event_id", (F.col("event_id") + F.lit(i * OFF)).cast("long"))),
            "events")
    if not done("documents"):
        docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))

        def doc_copy(d, i):
            if i == 0:
                return d
            text = F.concat(F.lit(("sfpad%d " % i) * i), F.col("text"))
            return (
                d.withColumn("doc_id", (F.col("doc_id") + F.lit(i * OFF)).cast("long"))
                .withColumn("text", text)
                .withColumn("n_chars", F.length("text").cast("long"))
            )

        write(copies(docs, doc_copy), "documents")
    if not done("embeddings"):
        emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        dim = len(emb.select("embedding").first()[0])

        def emb_copy(d, i):
            if i == 0:
                return d
            rot = F.concat(
                F.slice("embedding", i + 1, dim - i), F.slice("embedding", 1, i)
            )
            return d.select(
                (F.col("vec_id") + F.lit(i * OFF)).cast("long").alias("vec_id"),
                rot.cast("array<float>").alias("embedding"),
                *[c for c in d.columns if c not in ("vec_id", "embedding")],
            )

        write(copies(emb, emb_copy), "embeddings")


def main():
    argv = sys.argv[1:]
    gen_only = "--gen-only" in argv
    out_file = None
    if "--out" in argv:
        i = argv.index("--out")
        out_file = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    import __spark_entry__ as entry
    from flatbread_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app="fb-sf1-spot", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # split the single-file tables into row-group-sized scan tasks
    # (guide §6: split size adapted to the layout, not the default)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(256 * 1024))
    _gen(spark)
    if gen_only:
        return
    qs = entry.queries()
    names = [n for n in (args or DEFAULT_QUERIES) if n in qs]
    times: dict[str, float] = {}
    sc = spark.sparkContext
    # one warm-up pass over the fact tables so the first query is not
    # billed the page-cache/codegen cold start (mirrors bench.py's intent
    # without copying its timed methodology — this file is one-pass)
    import pyspark.sql.functions as F
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(DST, t + ".parquet")).agg(
            F.count(F.lit(1))
        ).collect()
    for name in names:
        sc.setJobDescription(f"sf1:{name}")
        t0 = time.perf_counter()
        try:
            qs[name](spark, DST).collect()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record, keep going
            times[name] = -1.0
            print(f"# FAILED {name}: {exc}", flush=True)
        print(f"# {name}: {times[name]}s", flush=True)
    # host-mode evidence: this box's hypervisor throttles SMP
    # unpredictably (bench.py docs); record both probes so flat 8c/32c
    # ratios can be attributed to the host rather than the operators
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import host_probe, parallel_probe

    line = {
        "sf": "sf1-synthetic-10x",
        "copies": COPIES,
        "cpus": cpus,
        "timing": "single_pass",
        "queries": times,
        "total": round(sum(t for t in times.values() if t > 0), 3),
        "host_probe_sec": round(host_probe(), 3),
        "host_parallel_eff": parallel_probe(),
    }
    print(json.dumps(line), flush=True)
    if out_file:
        with open(out_file, "w") as f:
            json.dump(line, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
