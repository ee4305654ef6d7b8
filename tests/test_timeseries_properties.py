"""Property sweeps for the ingest-bookkeeping pair: incremental dedup
classification and per-key gap filling, each against a pure-Python
replay on random shapes (negative ordinals, single-observation keys,
batch-internal duplicate fingerprints, corpus overlaps)."""
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

batch = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 5)),  # (id, fp)
    min_size=1, max_size=12, unique_by=lambda r: r[0],
)
corpus_fps = st.lists(st.integers(0, 5), max_size=4)


@given(rows=batch, seen=corpus_fps)
@settings(**SET)
def test_dedup_incremental_matches_python_classification(spark, rows, seen):
    from flatbread_spark.operators.dedup import dedup_incremental

    new_df = spark.createDataFrame(rows, "doc_id bigint, fp bigint")
    seen_df = spark.createDataFrame(
        [(f,) for f in seen], "fingerprint bigint"
    )
    got = {
        r["doc_id"]: r["status"]
        for r in dedup_incremental(
            new_df, "doc_id", F.col("fp"), seen_df
        ).collect()
    }
    first_id = {}
    for i, f in rows:
        first_id[f] = min(first_id.get(f, i), i)
    expect = {}
    for i, f in rows:
        if f in set(seen):
            expect[i] = "dup_corpus"
        elif i != first_id[f]:
            expect[i] = "dup_batch"
        else:
            expect[i] = "new"
    assert got == expect


series = st.lists(
    st.tuples(st.integers(0, 1), st.integers(-20, 20), st.integers(1, 9)),
    min_size=1, max_size=14, unique_by=lambda r: (r[0], r[1]),
)


@given(rows=series, step=st.sampled_from([1, 3, 5]))
@settings(**SET)
def test_gap_fill_matches_python_replay(spark, rows, step):
    """Spine covers [first, last] bucket per key inclusive; missing
    buckets carry NULL counts and forward-filled values from the most
    recent observed bucket (floor bucketing must hold for NEGATIVE
    ordinals too)."""
    from flatbread_spark.operators.timeseries import gap_fill

    df = spark.createDataFrame(rows, "k bigint, t bigint, v bigint")
    got = {
        (r["k"], r["bucket_start"]): (r["n"], r["v"])
        for r in gap_fill(
            df, ["k"], "t", step,
            {"n": F.count(F.lit(1)), "v": F.sum("v")},
            fill=["v"],
        ).collect()
    }
    bkt = lambda t: (t // step) * step
    expect = {}
    by_key = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    for k, obs in by_key.items():
        per_bucket = {}
        for t, v in obs:
            n, s = per_bucket.get(bkt(t), (0, 0))
            per_bucket[bkt(t)] = (n + 1, s + v)
        lo, hi = min(per_bucket), max(per_bucket)
        last_v = None
        b = lo
        while b <= hi:
            if b in per_bucket:
                n, s = per_bucket[b]
                last_v = s
                expect[(k, b)] = (n, s)
            else:
                expect[(k, b)] = (None, last_v)
            b += step
    assert got == expect
