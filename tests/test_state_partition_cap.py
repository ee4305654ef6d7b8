"""bounded_state_partitions — the r10 stream-replay bench-outlier fix.

The events replays (stream_replay / stream_rate_anomaly) hold ~1.5k keys
but paid 32 state-store commits + 32 concurrent Python state workers per
micro-batch under the bench env; capping the stateful stage at 8
partitions halved warm addBatch time and removed the contention
amplification. Pinned here: the cap never RAISES the session value
(plan-golden collection under its 4-partition env is unchanged), always
restores (also on error), and serializes overlapping overrides.
"""
import pytest


def _get(spark):
    return spark.conf.get("spark.sql.shuffle.partitions")


def test_caps_but_never_raises(spark):
    from flatbread_spark.streaming.replay import bounded_state_partitions

    before = _get(spark)  # conftest session runs 4
    assert before == "4"
    with bounded_state_partitions(spark, cap=8):
        assert _get(spark) == "4", "cap must never raise the session value"
    assert _get(spark) == before

    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        with bounded_state_partitions(spark, cap=8):
            assert _get(spark) == "8"
        assert _get(spark) == "32"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_restores_on_error(spark):
    from flatbread_spark.streaming.replay import bounded_state_partitions

    before = _get(spark)
    with pytest.raises(RuntimeError):
        with bounded_state_partitions(spark, cap=1):
            assert _get(spark) == "1"
            raise RuntimeError("drain blew up")
    assert _get(spark) == before


def test_overlapping_overrides_serialize(spark):
    """Two racing drains must not restore each other's intermediate value
    (the r9 probe-conf race class): the lock covers the whole window, so
    after both complete the conf is back to the true original."""
    import threading

    from flatbread_spark.streaming.replay import bounded_state_partitions

    before = _get(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    errs = []

    def drain(cap):
        try:
            with bounded_state_partitions(spark, cap=cap):
                assert _get(spark) == str(cap)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=drain, args=(c,)) for c in (2, 3, 5, 7)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    try:
        assert not errs
        assert _get(spark) == "32"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
