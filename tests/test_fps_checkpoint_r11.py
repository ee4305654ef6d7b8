"""Round-11 fps_select rework pins (OPTIMIZATION_r11).

The greedy FPS loop accumulated its running-min distance fold as
unmaterialized ``withColumn`` chains: iteration r re-evaluated all r
distance higher-order functions per row (HOFs are interpreted — O(k²/2)
interpreted array passes total, the ``lang_segments`` churn class), and
the old every-8-iterations EAGER checkpoint paid one extra Spark job per
cut (the multi-job contention amplifier). The rework cuts EVERY iteration
with a LAZY ``localCheckpoint`` materialized by that iteration's own
argmax collect — O(k) HOF passes, zero extra jobs, constant plan depth —
and releases the superseded iteration's blocks through
``cache.release_local_checkpoint`` so peak cache stays ~2 copies.

Pinned here: (1) selection values match a Python brute-force replay of
the exact BIGINT recurrence (the materialization points must not change
a single argmax); (2) the job-count ratchet — k-point selection runs in
at most k+1 driver jobs (one per bounded collect, nothing else); (3) the
release helper actually frees the checkpoint blocks and is safely a
no-op on non-checkpointed frames.
"""
import math

import pytest
from pyspark.sql import functions as F


def _codes(vec):
    """Python replay of int8_scale/int8_codes (max|v|/127, floor(v/s+.5))."""
    m = max(abs(float(x)) for x in vec)
    if m == 0:
        return [0] * len(vec)
    s = m / 127.0
    return [math.floor(float(x) / s + 0.5) for x in vec]


def _fps_bruteforce(rows, k):
    """Exact replay: start at smallest id, then argmax of min squared code
    distance to chosen, ties by smallest id, stop when max dist is 0."""
    codes = {i: _codes(v) for i, v in rows}
    chosen = [(0, min(codes), 0)]
    dist = {i: None for i in codes}
    for rank in range(1, k):
        last = codes[chosen[-1][1]]
        best = None
        for i, c in codes.items():
            d_new = sum((a - b) * (a - b) for a, b in zip(c, last))
            dist[i] = d_new if dist[i] is None else min(dist[i], d_new)
            if dist[i] > 0:
                cand = (-dist[i], i)
                if best is None or cand < best:
                    best = cand
        if best is None:
            break
        chosen.append((rank, best[1], -best[0]))
    return chosen


def test_fps_select_matches_bruteforce_after_checkpoint_rework(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flatbread_spark.operators.sampling import fps_select

    @given(
        vecs=st.lists(
            st.lists(st.integers(-40, 40), min_size=4, max_size=4),
            min_size=1,
            max_size=24,
        )
    )
    @settings(max_examples=6, deadline=None)
    def check(vecs):
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        got = [
            (r["rank"], r["vec_id"], r["min_dist"])
            for r in fps_select(df, "vec_id", "embedding", k=5)
            .orderBy("rank")
            .collect()
        ]
        assert got == _fps_bruteforce(rows, 5)

    check()


def test_fps_select_job_count_ratchet(spark):
    """k-point selection = k bounded collects (first pick + k−1 argmaxes),
    each materializing its iteration's lazy checkpoint in the SAME job.
    The ratchet allows one job of slack for a lazy-checkpoint back-fill;
    the old shape (eager initial checkpoint + eager every-8 cuts) cannot
    fit under it."""
    from flatbread_spark.operators.sampling import fps_select

    df = spark.range(0, 64).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 13).cast("double"),
            (F.col("id") % 7).cast("double"),
            (F.col("id") * 3 % 11).cast("double"),
        ).alias("embedding"),
    )
    k = 6
    tracker = spark.sparkContext.statusTracker()
    group = "fps-job-ratchet"
    spark.sparkContext.setJobGroup(group, "fps job-count ratchet")
    try:
        got = fps_select(df, "vec_id", "embedding", k=k).collect()
    finally:
        spark.sparkContext.setJobGroup(None, None)
    assert len(got) == k
    jobs = len(tracker.getJobIdsForGroup(group))
    # k in-loop collects (first pick + k−1 argmaxes, each materializing
    # its iteration's lazy checkpoint) + 1 for the final result collect;
    # the pre-rework shape pays one more for its eager initial checkpoint
    assert jobs <= k + 1, f"fps_select ran {jobs} jobs for k={k}"


def test_fps_select_leaves_no_checkpoint_blocks(spark):
    """Every iteration's superseded checkpoint AND the final state must be
    released: a long-running curation driver calling fps_select per shard
    must not accumulate one codes-copy per call (the null __d seed rides
    inside the checkpointed projection so even the FIRST handle is a
    releasable LogicalRDD root)."""
    import time

    from flatbread_spark.operators.sampling import fps_select

    df = spark.range(0, 48).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 17).cast("double"), (F.col("id") % 5).cast("double")
        ).alias("embedding"),
    )
    jsc = spark.sparkContext._jsc.sc()
    baseline = len(jsc.getRDDStorageInfo())
    assert len(fps_select(df, "vec_id", "embedding", k=4).collect()) == 4
    for _ in range(50):  # releases are non-blocking; poll
        if len(jsc.getRDDStorageInfo()) <= baseline:
            break
        time.sleep(0.1)
    assert len(jsc.getRDDStorageInfo()) <= baseline


def test_release_local_checkpoint_frees_blocks(spark):
    from flatbread_spark.cache import release_local_checkpoint

    df = spark.range(0, 100).localCheckpoint(eager=True)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getRDDStorageInfo()
    assert len(before) > 0  # the checkpoint pinned blocks
    assert release_local_checkpoint(df, blocking=True) is True
    # a released checkpoint has no lineage left: recompute must fail
    # loudly, never silently return different rows
    with pytest.raises(Exception):
        df.count()


def test_release_local_checkpoint_noop_on_plain_frames(spark):
    from flatbread_spark.cache import release_local_checkpoint

    assert release_local_checkpoint(spark.range(5)) is False
    persisted = spark.range(5).persist()
    try:
        # persisted-but-not-checkpointed: not a LogicalRDD, must refuse
        assert release_local_checkpoint(persisted) is False
    finally:
        persisted.unpersist()
