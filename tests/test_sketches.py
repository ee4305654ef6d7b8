"""Sketch aggregates (q_approx_profile): estimates within documented error
bounds of the exact values, and the DataSketches HLL partials merge — the
property that makes sketches the 100 TB profiling path."""
import pytest
from pyspark.sql import functions as F


def test_approx_profile_within_bounds(spark, documents):
    import __spark_entry__ as entry

    rows = entry.q_approx_profile(spark, "/root/testdata/sf0.001").collect()
    assert rows, "profile must cover every source"
    for r in rows:
        # HLL++ at rsd=0.05: allow 3 sigma
        assert abs(r.hllpp_distinct - r.exact_distinct) <= max(
            3 * 0.05 * r.exact_distinct, 2
        ), r
        # DataSketches HLL default lgk=12 is ~1.6% rsd; 3 sigma + slack
        assert abs(r.sketch_distinct - r.exact_distinct) <= max(
            0.1 * r.exact_distinct, 2
        ), r
        # approx_percentile with accuracy >> n is exact
        assert abs(r.approx_p50 - r.exact_p50) <= max(0.02 * r.exact_p50, 1), r


def test_hll_sketch_partials_merge(spark, documents):
    """Union of per-shard sketches estimates the same cardinality as the
    single-pass sketch — the mergeability contract that lets daily/shard
    sketches roll up without rescanning the corpus. (Not exact equality:
    the union accumulator is a different HLL representation, so estimates
    can differ within the sketch's error bound.)"""
    one_pass = documents.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("doc_id")).alias("n")
    ).first()["n"]
    merged = (
        documents.withColumn("shard", F.col("doc_id") % 7)
        .groupBy("shard")
        .agg(F.hll_sketch_agg("doc_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .first()["n"]
    )
    assert abs(merged - one_pass) <= max(0.02 * one_pass, 2), (merged, one_pass)


def test_compression_ratio_orders_repetition(spark):
    """Repetitive text compresses much better than high-entropy text —
    the property the quality gate relies on."""
    import random

    from pyspark.sql import functions as F

    from flatbread_spark.functions._arrow_kernels import (
        make_compression_ratio_udf,
    )

    rng = random.Random(7)
    noisy = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(2000))
    df = spark.createDataFrame(
        [(0, "spam " * 400), (1, noisy), (2, None)],
        "doc_id bigint, text string",
    )
    kern = make_compression_ratio_udf()
    rows = {r.doc_id: r.c for r in
            df.select("doc_id", kern("text").alias("c")).collect()}
    assert rows[0].ratio < 0.1                      # pure repetition
    assert rows[1].ratio > 0.5                      # near-incompressible
    assert rows[2].ratio is None and rows[2].raw_bytes == 0
    assert rows[1].raw_bytes == 2000
