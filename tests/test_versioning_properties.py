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
