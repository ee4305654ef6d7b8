"""Cross-engine libm audit for the transcendental-valued graded queries.

ADVICE r4 (tokenizer.py): ``char_entropy`` (log2) and ``mix_temperature``
(pow) put transcendental functions into value-hash-graded queries. JVM
``Math.log``/``Math.pow`` and DuckDB's libm are each within 1 ulp of the
true value but NOT guaranteed identical, and the repo's round-to-9 →
DECIMAL accumulation pattern only protects when the value isn't within
~1 ulp of a x.5e-9 rounding boundary. A synthetic sweep of the 200 most
boundary-hugging inputs out of 200k found 17 real round-9 mismatches for
``n·log2(n)`` — the straddle rate on ADVERSARIAL inputs is ~10%, on random
inputs ~1e-4 per term.

These tests therefore audit the ACTUAL graded inputs: every distinct
per-(doc,char) count and doc total feeding ``char_entropy``, and every
share feeding ``mix_temperature``, at the pytest SF and the driver-graded
sf0.01. If the data ever drifts onto a straddling input, these fail before
the driver does — and the fix is to perturb the rounding contract, not to
chase a heisen-hash.
"""
import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_char_entropy_log2_terms_engine_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    # every integer n whose n*log2(n) (and log2(total)) enters the graded sum
    per_char = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ns = {r.n for r in per_char.select("n").distinct().collect()}
    ns |= {
        r.t
        for r in per_char.groupBy("doc_id")
        .agg(F.sum("n").alias("t"))
        .select("t")
        .distinct()
        .collect()
    }
    ndf = spark.createDataFrame([(int(n),) for n in sorted(ns)], "n long")
    sp = {
        r.n: (repr(r.c), repr(r.l))
        for r in ndf.select(
            "n",
            F.round(F.col("n") * F.log2("n"), 9).alias("c"),
            F.round(F.log2("n"), 6).alias("l"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(n BIGINT); INSERT INTO t "
        + " UNION ALL ".join(f"SELECT {n}" for n in sorted(ns))
    )
    du = {
        n: (repr(c), repr(l))
        for n, c, l in con.sql(
            "SELECT n, round(n*log2(n), 9), round(log2(n), 6) FROM t"
        ).fetchall()
    }
    bad = [(n, sp[n], du[n]) for n in sp if sp[n] != du[n]]
    assert not bad, f"round-9/6 straddle on graded data: {bad[:5]}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_mix_temperature_pow_terms_engine_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    grouped = (
        docs.select(
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("w"),
        )
        .groupBy("source")
        .agg(F.sum("w").alias("raw"))
    )
    rows = grouped.collect()
    total = sum(r.raw for r in rows)
    pairs = [(int(r.raw), int(total)) for r in rows]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    sp = {
        (r.a, r.b): (repr(r.p), repr(r.s))
        for r in pdf.select(
            "a",
            "b",
            F.round(F.pow(F.col("a") / F.col("b"), F.lit(0.3)), 9).alias("p"),
            F.round(F.col("a") / F.col("b"), 6).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    du = {}
    for a, b in pairs:
        p, s = con.sql(
            f"SELECT round(pow({a}/{b}.0, 0.3), 9), round({a}/{b}.0, 6)"
        ).fetchone()
        du[(a, b)] = (repr(p), repr(s))
    bad = [(k, sp[k], du[k]) for k in sp if sp[k] != du[k]]
    assert not bad, f"round-9/6 straddle on graded shares: {bad}"
