"""Property-based sweeps for the event-sequence family (VERDICT r6 #5):
randomized event logs vs pure-Python oracles, in the style the
percentage/rounding families got (which caught the r4 decimal bug).

Pinned corners the strategies force:
- timestamp TIES (ts drawn from a tiny range) — resolved by the unique
  event-id tiebreak in transitions/paths, by frame-peer semantics in
  rolling_counts, and by strict inequality in funnel;
- single-event and EMPTY keys (contribute nothing to transitions/paths);
- zero converting keys (conversion_lag returns an empty frame);
- backwards conversions (first purchase before first view — dropped).

One Spark job per example is the cost: examples are capped at 8 and logs
are tiny, which is where the combinatorial corners live anyway.
"""
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

STATES = ["a", "b", "c"]

# (key, ts, state) triples; the unique event id is the list index.
# ts range 0..6 over up to 24 events forces heavy tie pileups.
logs = st.lists(
    st.tuples(
        st.integers(0, 4),
        st.integers(0, 6),
        st.sampled_from(STATES),
    ),
    min_size=0,
    max_size=24,
)

SCHEMA = "key bigint, ts bigint, eid bigint, state string"


def lift(spark, log):
    rows = [(k, t, i, s) for i, (k, t, s) in enumerate(log)]
    return rows, spark.createDataFrame(rows, SCHEMA)


def _sorted_states(rows, key):
    return [
        s
        for _, _, _, s in sorted(
            (r for r in rows if r[0] == key), key=lambda r: (r[1], r[2])
        )
    ]


@given(log=logs)
@settings(**SET)
def test_event_transitions_matches_oracle(spark, log):
    from flatbread_spark.operators.events import event_transitions

    rows, df = lift(spark, log)
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["n_from"], r["p_ppm"])
        for r in event_transitions(df, "key", "ts", "state", "eid").collect()
    }
    pairs: dict[tuple, int] = {}
    for key in {r[0] for r in rows}:
        seq = _sorted_states(rows, key)
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    n_from = {}
    for (a, _), n in pairs.items():
        n_from[a] = n_from.get(a, 0) + n
    want = {
        (a, b): (n, n_from[a], n * 1_000_000 // n_from[a])
        for (a, b), n in pairs.items()
    }
    assert got == want


@given(log=logs, k=st.integers(1, 4))
@settings(**SET)
def test_session_paths_matches_oracle(spark, log, k):
    from flatbread_spark.operators.events import session_paths

    rows, df = lift(spark, log)
    got = {
        r["path"]: (r["n_keys"], r["share_ppm"])
        for r in session_paths(df, "key", "ts", "state", k=k,
                               tiebreak_col="eid").collect()
    }
    paths: dict[str, int] = {}
    for key in {r[0] for r in rows}:
        p = ">".join(_sorted_states(rows, key)[:k])
        paths[p] = paths.get(p, 0) + 1
    total = sum(paths.values())
    want = {p: (n, n * 1_000_000 // total) for p, n in paths.items()}
    assert got == want


@given(log=logs)
@settings(**SET)
def test_conversion_lag_matches_oracle(spark, log):
    from flatbread_spark.operators.events import conversion_lag

    q_ppm = (250_000, 500_000, 990_000)
    rows, df = lift(spark, log)
    got = sorted(
        (r["q_ppm"], r["pos"], r["n"], r["lag"])
        for r in conversion_lag(
            df, "key", "ts", "state", "a", "b", q_ppm=q_ppm
        ).collect()
    )
    lags = []
    for key in {r[0] for r in rows}:
        ts_a = [r[1] for r in rows if r[0] == key and r[3] == "a"]
        ts_b = [r[1] for r in rows if r[0] == key and r[3] == "b"]
        if ts_a and ts_b and min(ts_b) >= min(ts_a):
            lags.append((min(ts_b) - min(ts_a), key))
    n = len(lags)
    if n == 0:
        assert got == []
        return
    ordered = sorted(lags)  # exact_percentiles ranks by (value, key)
    want = sorted(
        (q, max(1, math.ceil(q * n / 1_000_000)), n,
         ordered[max(1, math.ceil(q * n / 1_000_000)) - 1][0])
        for q in q_ppm
    )
    assert got == want


@given(log=logs, window=st.integers(0, 5))
@settings(**SET)
def test_rolling_counts_matches_oracle(spark, log, window):
    from flatbread_spark.operators.events import rolling_counts

    rows, df = lift(spark, log)
    got = sorted(
        (r["eid"], r["n_win"], r["sum_win"])
        for r in rolling_counts(
            df, "key", "ts", window=window + 1, value_col="eid"
        ).collect()
    )
    want = []
    for k, t, i, _ in rows:
        inside = [r for r in rows if r[0] == k and t - (window + 1) <= r[1] <= t]
        want.append((i, len(inside), float(sum(r[2] for r in inside))))
    assert got == sorted(want)


@given(log=logs)
@settings(**SET)
def test_funnel_ties_do_not_double_advance(spark, log):
    from flatbread_spark.operators.events import funnel

    steps = ["a", "b", "c"]
    rows, df = lift(spark, log)
    got = {
        r["step"]: r["n_users"]
        for r in funnel(df, "key", "ts", "state", steps).collect()
    }

    def reached(key):
        evs = sorted(
            ((r[1], r[3]) for r in rows if r[0] == key and r[3] in steps),
        )
        step, last_t = 0, None
        for t, y in evs:
            if step < 3 and y == steps[step] and (last_t is None or t > last_t):
                step, last_t = step + 1, t
        return step

    keys = {r[0] for r in rows}
    want = {
        i + 1: sum(1 for k in keys if reached(k) >= i + 1) for i in range(3)
    }
    assert got == want
