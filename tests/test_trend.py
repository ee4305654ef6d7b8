"""Theil-Sen robust trend: exact median-of-slopes vs a pure-Python oracle,
truncating-division parity on negative slopes, outlier robustness."""
import itertools

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _oracle(series):
    slopes = []
    for (x1, y1), (x2, y2) in itertools.combinations(sorted(series), 2):
        if x1 == x2:
            continue
        num, den = (y2 - y1) * 1_000_000, (x2 - x1)
        q = abs(num) // den
        slopes.append(q if num >= 0 else -q)  # truncating division
    slopes.sort()
    n = len(slopes)
    return n, slopes[(n + 1) // 2 - 1] if n else None


class TestTheilSen:
    def test_matches_python_including_negative_floor(self, spark):
        from flatbread_spark.operators.trend import theil_sen

        groups = {
            "up": [(0, 10), (1, 12), (2, 14), (3, 100), (4, 18)],
            "down": [(0, 50), (1, 45), (2, 40), (3, 35)],
            "flat": [(0, 7), (5, 7), (9, 7)],
            "neg_odd": [(0, 10), (3, 3)],       # slope -7/3: trunc, not floor
        }
        rows = [(g, x, y) for g, s in groups.items() for x, y in s]
        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        out = {
            r["g"]: (r["n_pairs"], r["slope_ppm"])
            for r in theil_sen(df, "g", "x", "y").collect()
        }
        for g, s in groups.items():
            assert out[g] == _oracle(s), g
        # the trunc-vs-floor witness: -7000000/3 truncates to -2333333
        assert out["neg_odd"][1] == -2_333_333

    def test_outlier_robustness(self, spark):
        from flatbread_spark.operators.trend import theil_sen

        # perfect slope 2 with one wild burst point
        series = [(x, 2 * x) for x in range(10)] + [(10, 100_000)]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in series], "g string, x bigint, y bigint"
        )
        out = theil_sen(df, "g", "x", "y").collect()[0]
        assert out["slope_ppm"] == 2_000_000

    def test_groups_without_two_x_points_absent(self, spark):
        from flatbread_spark.operators.trend import theil_sen

        rows = [("solo", 1, 5), ("dup_x", 3, 1), ("dup_x", 3, 9),
                ("ok", 0, 0), ("ok", 1, 1)]
        df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
        out = {r["g"] for r in theil_sen(df, "g", "x", "y").collect()}
        assert out == {"ok"}

    @given(
        series=st.lists(
            st.tuples(st.integers(0, 30), st.integers(-50, 50)),
            min_size=2, max_size=12, unique_by=lambda p: p[0],
        )
    )
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_property_matches_oracle(self, spark, series):
        from flatbread_spark.operators.trend import theil_sen

        df = spark.createDataFrame(
            [("g", x, y) for x, y in series], "g string, x bigint, y bigint"
        )
        rows = theil_sen(df, "g", "x", "y").collect()
        n, med = _oracle(series)
        if n == 0:
            assert rows == []
        else:
            assert (rows[0]["n_pairs"], rows[0]["slope_ppm"]) == (n, med)


# --------------------------------------------------------------------- ks_drift
class TestKsDrift:
    @staticmethod
    def _oracle(xa, xb):
        from collections import Counter

        Ca, Cb = Counter(xa), Counter(xb)
        na, nb = len(xa), len(xb)
        ca = cb = 0
        best = (-1, None)
        for v in sorted(set(xa) | set(xb)):
            ca += Ca[v]
            cb += Cb[v]
            g = abs(ca * nb - cb * na)
            if g > best[0]:
                best = (g, v)
        return na, nb, best[0] * 1_000_000 // (na * nb), best[1]

    def _run(self, spark, xa, xb):
        from flatbread_spark.operators.trend import ks_drift

        da = spark.createDataFrame([(v,) for v in xa], "x bigint")
        db = spark.createDataFrame([(v,) for v in xb], "x bigint")
        r = ks_drift(da, db, "x").collect()[0]
        return (r["n_a"], r["n_b"], r["d_ppm"], r["ks_at"])

    def test_identical_is_zero(self, spark):
        assert self._run(spark, [1, 2, 3], [1, 2, 3]) == (3, 3, 0, 1)

    def test_disjoint_is_full(self, spark):
        got = self._run(spark, [1, 1, 2], [8, 9, 9])
        assert got[2] == 1_000_000

    def test_unbalanced_sizes_match_oracle(self, spark):
        xa, xb = [1, 2, 2, 3, 7], [2, 3, 3, 3, 9, 9]
        assert self._run(spark, xa, xb) == self._oracle(xa, xb)

    def test_empty_side_raises(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(spark, [1], [])

    @given(
        xa=st.lists(st.integers(0, 12), min_size=1, max_size=30),
        xb=st.lists(st.integers(0, 12), min_size=1, max_size=30),
    )
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_property_matches_oracle(self, spark, xa, xb):
        assert self._run(spark, xa, xb) == self._oracle(xa, xb)


# -------------------------------------------------------------------- tvd_drift
class TestTvdDrift:
    @staticmethod
    def _oracle(xa, xb):
        from collections import Counter

        Ca, Cb = Counter(xa), Counter(xb)
        na, nb = len(xa), len(xb)
        cats = set(xa) | set(xb)
        G = sum(abs(Ca[c] * nb - Cb[c] * na) for c in cats)
        return na, nb, len(cats), G * 1_000_000 // (2 * na * nb)

    def _run(self, spark, xa, xb):
        from flatbread_spark.operators.trend import tvd_drift

        da = spark.createDataFrame([(v,) for v in xa], "c string")
        db = spark.createDataFrame([(v,) for v in xb], "c string")
        r = tvd_drift(da, db, "c").collect()[0]
        return (r["n_a"], r["n_b"], r["n_cats"], r["tvd_ppm"])

    def test_identical_zero_disjoint_full(self, spark):
        assert self._run(spark, ["a", "b"], ["a", "b"])[3] == 0
        assert self._run(spark, ["a"] * 3, ["b"] * 2)[3] == 1_000_000

    def test_empty_side_raises(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run(spark, ["a"], [])

    @given(
        xa=st.lists(st.sampled_from("abcde"), min_size=1, max_size=25),
        xb=st.lists(st.sampled_from("abcde"), min_size=1, max_size=25),
    )
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_property_matches_oracle(self, spark, xa, xb):
        assert self._run(spark, xa, xb) == self._oracle(xa, xb)


# --------------------------------------------------------------- rolling_median
class TestRollingMedian:
    def test_matches_python_and_resists_burst(self, spark):
        import math

        from flatbread_spark.operators.trend import rolling_median

        series = [3, 9, 1, 7, 7, 100, 2, 5, 4, 8]
        rows = [("g", i, v) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "g string, t bigint, v bigint")
        got = [
            r["rolling_median"]
            for r in rolling_median(df, "g", "t", "v", 5)
            .orderBy("t")
            .collect()
        ]
        exp = []
        for i in range(len(series)):
            win = sorted(series[max(0, i - 4):i + 1])
            exp.append(win[math.ceil(len(win) / 2) - 1])
        assert got == exp
        assert 100 not in got  # the burst never becomes the median

    def test_k1_is_identity(self, spark):
        from flatbread_spark.operators.trend import rolling_median

        rows = [("g", i, i * 3) for i in range(5)]
        df = spark.createDataFrame(rows, "g string, t bigint, v bigint")
        out = rolling_median(df, "g", "t", "v", 1).orderBy("t").collect()
        assert [r["rolling_median"] for r in out] == [r["v"] for r in out]

    def test_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.trend import rolling_median

        df = spark.createDataFrame([("g", 1, 1)], "g string, t bigint, v bigint")
        with _pytest.raises(ValueError):
            rolling_median(df, "g", "t", "v", 0)
