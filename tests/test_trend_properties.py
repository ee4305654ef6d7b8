"""Property sweeps for the trend family against Python replays: per-key
trailing-k exact rolling medians (lower-middle nearest-rank) and the
exact Theil–Sen median-of-pairwise-slopes, on random tie-heavy series
including negative values, duplicate y, and groups below the 2-point
minimum."""
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

series = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 15), st.integers(-5, 5)),
    min_size=1, max_size=14, unique_by=lambda r: (r[0], r[1]),
)


def nearest_rank_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]  # lower middle for even n


@given(rows=series, k=st.sampled_from([1, 3, 4]))
@settings(**SET)
def test_rolling_median_matches_python(spark, rows, k):
    from flatbread_spark.operators.trend import rolling_median

    df = spark.createDataFrame(rows, "g bigint, x bigint, y bigint")
    got = {
        (r["g"], r["x"]): r["rolling_median"]
        for r in rolling_median(df, "g", "x", "y", k).collect()
    }
    expect = {}
    by_key = {}
    for g, x, y in rows:
        by_key.setdefault(g, []).append((x, y))
    for g, obs in by_key.items():
        obs.sort()
        for i in range(len(obs)):
            window = [y for _, y in obs[max(0, i - k + 1) : i + 1]]
            expect[(g, obs[i][0])] = nearest_rank_median(window)
    assert got == expect


@given(rows=series)
@settings(**SET)
def test_theil_sen_matches_python(spark, rows):
    from flatbread_spark.operators.trend import theil_sen

    df = spark.createDataFrame(rows, "g bigint, x bigint, y bigint")
    got = {
        r["g"]: (r["n_points"], r["n_pairs"], r["slope_ppm"])
        for r in theil_sen(df, "g", "x", "y").collect()
    }
    expect = {}
    by_key = {}
    for g, x, y in rows:
        by_key.setdefault(g, []).append((x, y))
    for g, obs in by_key.items():
        if len(obs) < 2:
            continue  # below the 2-point minimum: no output row
        slopes = []
        for i in range(len(obs)):
            for j in range(i + 1, len(obs)):
                (x1, y1), (x2, y2) = obs[i], obs[j]
                # trunc toward zero, matching the operator's integer ppm
                slopes.append(int((y2 - y1) * 1_000_000 / (x2 - x1)))
        expect[g] = (len(obs), len(slopes), nearest_rank_median(slopes))
    assert got == expect
