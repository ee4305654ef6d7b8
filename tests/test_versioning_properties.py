"""Property sweep for latest-wins merge_upsert against a Python dict
replay: random base/delta snapshots (one row per key per frame — the
snapshot/batch contract) with overlapping keys, older/newer/tied
versions, and tombstones on both sides must merge to exactly the
replayed winner set — delta wins ties, winning tombstones delete."""
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

row = st.tuples(
    st.integers(0, 5),          # key
    st.integers(0, 3),          # version (small: dense ties)
    st.integers(0, 99),         # content
    st.booleans(),              # tombstone
)
frame = st.lists(row, min_size=0, max_size=6, unique_by=lambda r: r[0])


def replay(base, delta):
    best = {}
    for src, rows in ((0, base), (1, delta)):
        for k, v, c, dead in rows:
            cur = best.get(k)
            if cur is None or (v, src) >= (cur[0], cur[1]):
                best[k] = (v, src, c, dead)
    return {
        k: (v, c) for k, (v, src, c, dead) in best.items() if not dead
    }


@given(base=frame, delta=frame)
@settings(**SET)
def test_merge_upsert_matches_dict_replay(spark, base, delta):
    from flatbread_spark.operators.versioning import merge_upsert

    schema = "k bigint, version bigint, content bigint, deleted boolean"
    bdf = spark.createDataFrame(base, schema)
    ddf = spark.createDataFrame(delta, schema)
    got = {
        r["k"]: (r["version"], r["content"])
        for r in merge_upsert(
            bdf, ddf, ["k"], "version", delete_col="deleted"
        ).collect()
    }
    assert got == replay(base, delta)


@given(
    old=frame,
    new=frame,
)
@settings(**SET)
def test_snapshot_diff_summary_matches_set_algebra(spark, old, new):
    """added/deleted/changed/unchanged counts equal plain Python set
    algebra over the key→content maps (version column ignored — the
    comparison is content equality)."""
    from flatbread_spark.operators.versioning import snapshot_diff_summary

    schema = "k bigint, version bigint, content bigint, deleted boolean"
    odf = spark.createDataFrame(old, schema).drop("deleted", "version")
    ndf = spark.createDataFrame(new, schema).drop("deleted", "version")
    got = {
        r["status"]: r["n_keys"]
        for r in snapshot_diff_summary(odf, ndf, ["k"]).collect()
    }
    om = {k: c for k, _, c, _ in old}
    nm = {k: c for k, _, c, _ in new}
    expect = {
        "added": len(nm.keys() - om.keys()),
        "deleted": len(om.keys() - nm.keys()),
        "changed": sum(1 for k in om.keys() & nm.keys() if om[k] != nm[k]),
        "unchanged": sum(1 for k in om.keys() & nm.keys() if om[k] == nm[k]),
    }
    assert got == expect


changelog = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),
    min_size=1, max_size=12,
    unique_by=lambda r: (r[0], r[1]),   # ts unique per key (the contract)
)


@given(log=changelog)
@settings(**SET)
def test_scd2_intervals_match_python_replay(spark, log):
    """Per key: version numbers follow change order, intervals chain
    [ts_i, ts_{i+1}) with the last open (NULL valid_to, is_current), and
    the payload stays attached to its interval."""
    from flatbread_spark.operators.versioning import scd2_intervals

    df = spark.createDataFrame(
        [(k, ts, k * 100 + ts) for k, ts in log], "k bigint, ts bigint, c bigint"
    )
    got = {
        (r["k"], r["version"]): (
            r["valid_from"], r["valid_to"], r["is_current"], r["c"]
        )
        for r in scd2_intervals(df, "k", "ts").collect()
    }
    expect = {}
    by_key = {}
    for k, ts in log:
        by_key.setdefault(k, []).append(ts)
    for k, tss in by_key.items():
        tss.sort()
        for i, ts in enumerate(tss):
            nxt = tss[i + 1] if i + 1 < len(tss) else None
            expect[(k, i + 1)] = (ts, nxt, nxt is None, k * 100 + ts)
    assert got == expect
