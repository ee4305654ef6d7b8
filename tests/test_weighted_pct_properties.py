"""Property sweep for the weighted-percentile kernels (the analog of the
event-family sweep that VERDICT r6 #5 prescribed, applied to the one
family whose per-group and global kernels previously had only
example-based stress tests).

Oracle: pure-Python exact weighted nearest-rank — sort by (value, key)
with non-positive weights dropped, return the first value whose
cumulative weight ``cw`` satisfies ``q·W ≤ cw·1e6`` (exact Python ints,
so the DECIMAL(38,0) lane in the operators is independently re-derived).
Shapes pin the documented corners: heavy value ties, zero/negative
weights, singleton groups next to bulk groups, one mega-weight row
spanning every quantile target, and weights large enough that ``q·W``
overflows BIGINT (the reason the operators ride DECIMAL)."""
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

QS = [1, 250_000, 500_000, 990_000, 1_000_000]

# (group, value, weight) triples; values tie-heavy (0..5), weights include
# 0 and negatives (dropped by contract) and occasional huge weights that
# push q·W past BIGINT
row = st.tuples(
    st.sampled_from(["g0", "g1", "solo"]),
    st.integers(0, 5),
    st.one_of(
        st.integers(-2, 6),
        st.just(3_000_000_000_000),  # 3e12: q·W ≈ 3e18·q — BIGINT dies
    ),
)
rows_strategy = st.lists(row, min_size=1, max_size=24)


def py_weighted_pct(triples, qs):
    """Exact oracle: {q: value} for one population of (value, key, w)."""
    kept = sorted(
        [(v, k, w) for (v, k, w) in triples if w > 0], key=lambda t: (t[0], t[1])
    )
    if not kept:
        return {}
    total = sum(w for _, _, w in kept)
    out = {}
    for q in qs:
        cw = 0
        for v, _, w in kept:
            cw += w
            if q * total <= cw * 1_000_000:
                out[q] = v
                break
    return out


@given(data=rows_strategy)
@settings(**SET)
def test_weighted_percentiles_matches_python_oracle(spark, data):
    from flatbread_spark.operators.ranking import weighted_percentiles

    keyed = [(i, v, w) for i, (_, v, w) in enumerate(data)]
    df = spark.createDataFrame(keyed, "k bigint, v bigint, w bigint")
    expect = py_weighted_pct([(v, k, w) for k, v, w in keyed], QS)
    got = {
        r["q_ppm"]: (r["v"], r["n"], r["total_w"])
        for r in weighted_percentiles(df, "v", "w", "k", QS).collect()
    }
    kept = [(k, v, w) for k, v, w in keyed if w > 0]
    if not kept:
        assert got == {}
        return
    n, total = len(kept), sum(w for _, _, w in kept)
    assert set(got) == set(expect)
    for q, v in expect.items():
        assert got[q] == (v, n, total), f"q={q}: {got[q]} != {(v, n, total)}"


@given(data=rows_strategy)
@settings(**SET)
def test_group_weighted_percentiles_matches_python_oracle(spark, data):
    from flatbread_spark.operators.ranking import group_weighted_percentiles

    keyed = [(g, i, v, w) for i, (g, v, w) in enumerate(data)]
    df = spark.createDataFrame(keyed, "g string, k bigint, v bigint, w bigint")
    got = {}
    for r in group_weighted_percentiles(df, "g", "v", "w", "k", QS).collect():
        got[(r["g"], r["q_ppm"])] = (r["v"], r["n"], r["total_w"])
    expect = {}
    for g in {g for g, _, _, _ in keyed}:
        triples = [(v, k, w) for gg, k, v, w in keyed if gg == g]
        kept = [(v, k, w) for v, k, w in triples if w > 0]
        if not kept:
            continue
        n, total = len(kept), sum(w for _, _, w in kept)
        for q, v in py_weighted_pct(triples, QS).items():
            expect[(g, q)] = (v, n, total)
    assert got == expect


@given(seed=st.integers(0, 10_000))
@settings(**SET)
def test_mega_weight_row_absorbs_every_target(spark, seed):
    """One row carrying ~all the mass must win every quantile target, and
    the global and per-group kernels must agree on it exactly."""
    from flatbread_spark.operators.ranking import (
        group_weighted_percentiles,
        weighted_percentiles,
    )

    mega_v = seed % 7
    rows = [("g", 0, mega_v, 10**15)] + [
        ("g", i, (seed + i) % 7, 1) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g string, k bigint, v bigint, w bigint")
    expect = py_weighted_pct([(v, k, w) for _, k, v, w in rows], QS)
    flat = {
        r["q_ppm"]: r["v"]
        for r in weighted_percentiles(df, "v", "w", "k", QS).collect()
    }
    grouped = {
        r["q_ppm"]: r["v"]
        for r in group_weighted_percentiles(df, "g", "v", "w", "k", QS).collect()
    }
    assert flat == expect == grouped
