"""Round-14 operators: conversion_lag, rolling_counts, vocab_overlap,
gini_concentration — each checked against a pure-Python reference on
adversarial shapes (ties, dropped keys, empty intersections, constant and
single-giant distributions)."""
import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------------- conversion_lag
class TestConversionLag:
    def _events(self, spark):
        rows = [
            (1, 10, "view"), (1, 25, "purchase"),          # lag 15
            (2, 5, "view"), (2, 105, "purchase"),          # lag 100
            (3, 50, "purchase"), (3, 60, "view"),          # backwards: dropped
            (4, 7, "view"),                                 # no purchase: dropped
            (5, 0, "view"), (5, 1, "purchase"), (5, 9, "purchase"),  # lag 1
        ]
        return spark.createDataFrame(rows, "u bigint, t bigint, s string")

    def test_exact_nearest_rank(self, spark):
        from flatbread_spark.operators.events import conversion_lag

        out = (
            conversion_lag(
                self._events(spark), "u", "t", "s", "view", "purchase",
                q_ppm=(250_000, 500_000, 1_000_000),
            )
            .orderBy("q_ppm")
            .collect()
        )
        # converting lags sorted: [1, 15, 100]; ceil(q*n/1e6) positions
        assert [(r["q_ppm"], r["pos"], r["n"], r["lag"]) for r in out] == [
            (250_000, 1, 3, 1),
            (500_000, 2, 3, 15),
            (1_000_000, 3, 3, 100),
        ]

    def test_first_occurrence_not_any(self, spark):
        from flatbread_spark.operators.events import conversion_lag

        # user converts, then views again much later: lag uses FIRST view
        rows = [(1, 10, "view"), (1, 20, "purchase"), (1, 1000, "view")]
        df = spark.createDataFrame(rows, "u bigint, t bigint, s string")
        out = conversion_lag(df, "u", "t", "s", "view", "purchase",
                             q_ppm=(1_000_000,)).collect()
        assert out[0]["lag"] == 10

    def test_same_instant_counts(self, spark):
        from flatbread_spark.operators.events import conversion_lag

        rows = [(1, 10, "view"), (1, 10, "purchase")]
        df = spark.createDataFrame(rows, "u bigint, t bigint, s string")
        out = conversion_lag(df, "u", "t", "s", "view", "purchase",
                             q_ppm=(1_000_000,)).collect()
        assert out[0]["lag"] == 0 and out[0]["n"] == 1


# --------------------------------------------------------------- rolling_counts
class TestRollingCounts:
    def test_matches_python_bruteforce(self, spark):
        from flatbread_spark.operators.events import rolling_counts

        rows = [
            (i, i % 3, (i * 37) % 50, float(i % 7))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "eid bigint, u bigint, t bigint, v double")
        W = 10
        out = {
            r["eid"]: (r["n_win"], r["sum_win"])
            for r in rolling_counts(df, "u", "t", window=W, value_col="v")
            .collect()
        }
        for eid, u, t, _ in rows:
            in_win = [(e, uu, tt, vv) for e, uu, tt, vv in rows
                      if uu == u and t - W <= tt <= t]
            assert out[eid][0] == len(in_win), eid
            assert out[eid][1] == pytest.approx(sum(x[3] for x in in_win))

    def test_duplicate_ts_are_peers(self, spark):
        from flatbread_spark.operators.events import rolling_counts

        rows = [(1, 1, 10), (2, 1, 10), (3, 1, 10)]
        df = spark.createDataFrame(rows, "eid bigint, u bigint, t bigint")
        out = rolling_counts(df, "u", "t", window=5).collect()
        assert [r["n_win"] for r in out] == [3, 3, 3]

    def test_window_validation(self, spark):
        from flatbread_spark.operators.events import rolling_counts

        df = spark.createDataFrame([(1, 1, 1)], "eid bigint, u bigint, t bigint")
        with pytest.raises(ValueError):
            rolling_counts(df, "u", "t", window=0)


# ---------------------------------------------------------------- vocab_overlap
class TestVocabOverlap:
    def test_matches_python_sets(self, spark):
        from flatbread_spark.operators.curation import vocab_overlap

        corpora = {
            "s1": ["a b c", "c C a"],
            "s2": ["b c d", "d e"],
            "s3": ["x y", "y z"],
            "s4": ["a b c d e x y z"],
        }
        rows = [
            (i, text, src)
            for i, (src, texts) in enumerate(
                (s, t) for s, ts in sorted(corpora.items()) for t in [ts]
            )
            for text in texts
        ]
        df = spark.createDataFrame(rows, "id bigint, text string, src string")
        out = {
            (r["grp_a"], r["grp_b"]): (r["n_a"], r["n_b"], r["n_common"],
                                       r["jaccard_ppm"])
            for r in vocab_overlap(df, "src", "text").collect()
        }
        vocab = {
            s: set(w for t in ts for w in t.lower().split())
            for s, ts in corpora.items()
        }
        names = sorted(corpora)
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                inter = len(vocab[a] & vocab[b])
                if inter == 0:
                    assert (a, b) not in out, (a, b)
                    continue
                union = len(vocab[a] | vocab[b])
                assert out[(a, b)] == (
                    len(vocab[a]), len(vocab[b]), inter,
                    inter * 1_000_000 // union,
                ), (a, b)

    def test_case_sensitive_mode(self, spark):
        from flatbread_spark.operators.curation import vocab_overlap

        rows = [(1, "A b", "s1"), (2, "a b", "s2")]
        df = spark.createDataFrame(rows, "id bigint, text string, src string")
        out = vocab_overlap(df, "src", "text", lowercase=False).collect()
        # only "b" is shared when case matters
        assert out[0]["n_common"] == 1 and out[0]["jaccard_ppm"] == 333_333


# ----------------------------------------------------------- gini_concentration
class TestGini:
    @staticmethod
    def _gini_ppm(xs):
        xs = sorted(xs)
        n, s0 = len(xs), sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * s1 - (n + 1) * s0) * 1_000_000 // (n * s0)

    def test_matches_python(self, spark):
        from flatbread_spark.operators.curation import gini_concentration

        groups = {
            "flat": [5, 5, 5, 5],                 # gini 0
            "giant": [1, 1, 98],                  # one doc holds the mass
            "ramp": list(range(1, 11)),
            "ties": [3, 3, 7, 7, 7, 100],
        }
        rows = [
            (src, i, x)
            for src, xs in groups.items()
            for i, x in enumerate(xs)
        ]
        df = spark.createDataFrame(rows, "src string, id bigint, x bigint")
        out = {
            r["src"]: (r["n_docs"], r["total"], r["gini_ppm"])
            for r in gini_concentration(df, "src", "x", "id").collect()
        }
        for src, xs in groups.items():
            assert out[src] == (len(xs), sum(xs), self._gini_ppm(xs)), src

    def test_tiebreak_invariant(self, spark):
        """Equal values in any rank order give the same Gini (the identity
        is permutation-invariant across equal x), so key choice is free."""
        from flatbread_spark.operators.curation import gini_concentration

        rows_a = [("s", i, 7) for i in range(5)] + [("s", 10, 2)]
        rows_b = [("s", 100 - i, 7) for i in range(5)] + [("s", 0, 2)]
        for rows in (rows_a, rows_b):
            df = spark.createDataFrame(rows, "src string, id bigint, x bigint")
            out = gini_concentration(df, "src", "x", "id").collect()
            assert out[0]["gini_ppm"] == self._gini_ppm([7] * 5 + [2])


# ------------------------------------------------------ hypothesis properties
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

HSET = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),        # key
            st.integers(0, 60),       # ts
            st.floats(0, 10, allow_nan=False, width=16),
        ),
        min_size=1, max_size=40,
    ),
    window=st.integers(1, 20),
)
@settings(**HSET)
def test_rolling_counts_matches_bruteforce(spark, rows, window):
    from flatbread_spark.operators.events import rolling_counts

    data = [(i, k, t, float(v)) for i, (k, t, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "eid bigint, u bigint, t bigint, v double")
    out = {
        r["eid"]: r["n_win"]
        for r in rolling_counts(df, "u", "t", window=window).collect()
    }
    for eid, k, t, _ in data:
        expect = sum(
            1 for _, kk, tt, _ in data if kk == k and t - window <= tt <= t
        )
        assert out[eid] == expect, (eid, window)


@given(
    xs=st.lists(st.integers(0, 10_000), min_size=1, max_size=30).filter(
        lambda v: sum(v) > 0
    ),
    c=st.integers(1, 1000),
)
@settings(**HSET)
def test_gini_scale_invariant_and_bounded(spark, xs, c):
    """Gini is invariant under x -> c*x and lives in [0, 1e6)."""
    from flatbread_spark.operators.curation import gini_concentration

    rows = [("s", i, x) for i, x in enumerate(xs)] + [
        ("sc", i, x * c) for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "src string, id bigint, x bigint")
    out = {
        r["src"]: r["gini_ppm"]
        for r in gini_concentration(df, "src", "x", "id").collect()
    }
    assert out["s"] == out["sc"]
    assert 0 <= out["s"] < 1_000_000


@given(
    lags=st.lists(st.integers(0, 1_000_000), min_size=1, max_size=25),
    qs=st.lists(st.integers(1, 1_000_000), min_size=1, max_size=4,
                unique=True),
)
@settings(**HSET)
def test_conversion_lag_is_nearest_rank_of_sorted_lags(spark, lags, qs):
    from flatbread_spark.operators.events import conversion_lag

    rows = []
    for i, lag in enumerate(lags):
        rows.append((i, 0, "a"))
        rows.append((i, lag, "b"))
    df = spark.createDataFrame(rows, "u bigint, t bigint, s string")
    out = {
        r["q_ppm"]: r["lag"]
        for r in conversion_lag(
            df, "u", "t", "s", "a", "b", q_ppm=tuple(qs)
        ).collect()
    }
    ordered = sorted(lags)
    n = len(ordered)
    for q in qs:
        pos = max(1, -(-q * n // 1_000_000))  # ceil
        assert out[q] == ordered[pos - 1], q


# ------------------------------------------------------------------ fps_select
class TestFpsSelect:
    @staticmethod
    def _codes(v):
        import math

        s = max(abs(x) for x in v) / 127.0
        if s == 0:
            return [0] * len(v)
        return [math.floor(x / s + 0.5) for x in v]

    def _oracle(self, vecs, k):
        C = {i: self._codes(v) for i, v in vecs}

        def d2(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        chosen = [min(C)]
        out = [(0, chosen[0], 0)]
        for rank in range(1, k):
            best = None
            for i in sorted(C):
                if i in chosen:
                    continue
                dd = min(d2(C[i], C[c]) for c in chosen)
                if best is None or dd > best[1]:
                    best = (i, dd)
            if best is None:
                break
            chosen.append(best[0])
            out.append((rank, best[0], best[1]))
        return out

    def test_matches_python_greedy(self, spark):
        from flatbread_spark.operators.sampling import fps_select

        import random

        rng = random.Random(7)
        vecs = [
            (i, [rng.uniform(-5, 5) for _ in range(8)]) for i in range(30)
        ]
        df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
        got = [
            (r["rank"], r["vec_id"], r["min_dist"])
            for r in fps_select(df, "vec_id", "embedding", k=6).collect()
        ]
        # python oracle must quantize the same float32 values Spark sees
        f32 = [
            (i, [float(x) for x in row["embedding"]])
            for i, row in zip(
                [v[0] for v in vecs],
                df.orderBy("vec_id").collect(),
            )
        ]
        assert got == self._oracle(f32, 6)

    def test_hops_between_far_clusters(self, spark):
        from flatbread_spark.operators.sampling import fps_select

        vecs = (
            [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)]
            + [(10, [100.0, 100.0]), (11, [100.0, 100.01])]
            + [(20, [-100.0, 100.0])]
        )
        df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
        picks = [
            r["vec_id"]
            for r in fps_select(df, "vec_id", "embedding", k=3).collect()
        ]
        # first is min id (origin cluster); next two hit the two far corners
        assert picks[0] == 0 and set(picks[1:]) == {10, 20}

    def test_k_exceeding_rows_truncates(self, spark):
        from flatbread_spark.operators.sampling import fps_select

        vecs = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
        out = fps_select(df, "vec_id", "embedding", k=10).collect()
        assert len(out) == 2

    def test_validation(self, spark):
        from flatbread_spark.operators.sampling import fps_select

        df = spark.createDataFrame([(0, [1.0])], "vec_id bigint, embedding array<float>")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            fps_select(df, "vec_id", "embedding", k=0)


# --------------------------------------------------------- weighted_percentiles
class TestWeightedPercentiles:
    @staticmethod
    def _oracle(pairs, qs):
        pairs = sorted((v, i, w) for i, (v, w) in enumerate(pairs) if w > 0)
        W = sum(w for _, _, w in pairs)
        out = {}
        for q in qs:
            cum = 0
            for v, _, w in pairs:
                prev, cum = cum, cum + w
                if prev * 1_000_000 < q * W <= cum * 1_000_000:
                    out[q] = v
                    break
        return W, out

    def test_token_mass_vs_doc_median_diverge(self, spark):
        """One mega-doc holds most weight: the weighted median finds it,
        the unweighted median would not."""
        from flatbread_spark.operators.ranking import weighted_percentiles

        pairs = [(5, 1), (6, 1), (7, 1), (8, 1), (1000, 100)]
        df = spark.createDataFrame(
            [(i, v, w) for i, (v, w) in enumerate(pairs)],
            "k bigint, v bigint, w bigint",
        )
        out = {
            r["q_ppm"]: r["v"]
            for r in weighted_percentiles(df, "v", "w", "k", [500_000])
            .collect()
        }
        assert out[500_000] == 1000

    def test_zero_weights_dropped(self, spark):
        from flatbread_spark.operators.ranking import weighted_percentiles

        pairs = [(1, 0), (2, 5), (3, 0), (4, 5)]
        df = spark.createDataFrame(
            [(i, v, w) for i, (v, w) in enumerate(pairs)],
            "k bigint, v bigint, w bigint",
        )
        rows = weighted_percentiles(
            df, "v", "w", "k", [500_000, 500_001]
        ).collect()
        got = {r["q_ppm"]: (r["n"], r["total_w"], r["v"]) for r in rows}
        # boundary: exactly half the mass ends at v=2; one ppm later -> v=4
        assert got == {500_000: (2, 10, 2), 500_001: (2, 10, 4)}

    def test_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.ranking import weighted_percentiles

        df = spark.createDataFrame([(0, 1, 1)], "k bigint, v bigint, w bigint")
        with _pytest.raises(ValueError):
            weighted_percentiles(df, "v", "w", "k", [0])

    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 50), st.integers(0, 20)),
            min_size=1, max_size=25,
        ).filter(lambda ps: any(w > 0 for _, w in ps)),
        qs=st.lists(st.integers(1, 1_000_000), min_size=1, max_size=3,
                    unique=True),
    )
    @settings(**HSET)
    def test_property_matches_oracle(self, spark, pairs, qs):
        from flatbread_spark.operators.ranking import weighted_percentiles

        df = spark.createDataFrame(
            [(i, v, w) for i, (v, w) in enumerate(pairs)],
            "k bigint, v bigint, w bigint",
        )
        got = {
            r["q_ppm"]: (r["total_w"], r["v"])
            for r in weighted_percentiles(df, "v", "w", "k", qs).collect()
        }
        W, exp = self._oracle(pairs, qs)
        assert got == {q: (W, v) for q, v in exp.items()}


# -------------------------------------------------------------- sample_exact_n
class TestSampleExactN:
    def test_prefix_and_partition_invariance(self, spark):
        from flatbread_spark.operators.sampling import sample_exact_n

        df = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
        s5 = [r["k"] for r in sample_exact_n(df, "k", 5).collect()]
        s20 = [r["k"] for r in sample_exact_n(df, "k", 20).collect()]
        assert s20[:5] == s5
        s20b = [
            r["k"]
            for r in sample_exact_n(df.repartition(11), "k", 20).collect()
        ]
        assert s20 == s20b
        assert len(set(s20)) == 20

    def test_salt_decouples(self, spark):
        from flatbread_spark.operators.sampling import sample_exact_n

        df = spark.createDataFrame([(i,) for i in range(500)], "k bigint")
        a = {r["k"] for r in sample_exact_n(df, "k", 50, salt="a").collect()}
        b = {r["k"] for r in sample_exact_n(df, "k", 50, salt="b").collect()}
        assert a != b

    def test_n_zero_and_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.sampling import sample_exact_n

        df = spark.createDataFrame([(1,)], "k bigint")
        assert sample_exact_n(df, "k", 0).count() == 0
        with _pytest.raises(ValueError):
            sample_exact_n(df, "k", -1)


# -------------------------------------------------------------- scd2_intervals
class TestScd2Intervals:
    def test_intervals_chain(self, spark):
        from flatbread_spark.operators.versioning import scd2_intervals

        rows = [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "x")]
        df = spark.createDataFrame(rows, "k bigint, t bigint, v string")
        out = sorted(
            (r["k"], r["version"], r["valid_from"], r["valid_to"],
             r["is_current"], r["v"])
            for r in scd2_intervals(df, "k", "t").collect()
        )
        assert out == [
            (1, 1, 10, 20, False, "a"),
            (1, 2, 20, 30, False, "b"),
            (1, 3, 30, None, True, "c"),
            (2, 1, 5, None, True, "x"),
        ]

    def test_open_end_sentinel(self, spark):
        from flatbread_spark.operators.versioning import scd2_intervals

        df = spark.createDataFrame([(1, 10, "a")], "k bigint, t bigint, v string")
        r = scd2_intervals(df, "k", "t", open_end=10**15).collect()[0]
        assert r["valid_to"] == 10**15 and r["is_current"]

    def test_intervals_partition_time(self, spark):
        """Intervals tile [first_ts, inf) with no gaps or overlaps."""
        from flatbread_spark.operators.versioning import scd2_intervals

        rows = [(1, t, str(t)) for t in (3, 9, 14, 100, 101)]
        df = spark.createDataFrame(rows, "k bigint, t bigint, v string")
        ivs = sorted(
            (r["valid_from"], r["valid_to"])
            for r in scd2_intervals(df, "k", "t").collect()
        )
        for (f1, t1), (f2, _) in zip(ivs, ivs[1:]):
            assert t1 == f2
        assert ivs[-1][1] is None


# --------------------------------------------------- group_weighted_percentiles
class TestGroupWeightedPercentiles:
    @staticmethod
    def _oracle(groups, qs):
        out = {}
        for g, pairs in groups.items():
            ordered = sorted(
                (v, i, w) for i, (v, w) in enumerate(pairs) if w > 0
            )
            W = sum(w for _, _, w in ordered)
            n = len(ordered)
            for q in qs:
                cum = 0
                for v, _, w in ordered:
                    prev, cum = cum, cum + w
                    if prev * 1_000_000 < q * W <= cum * 1_000_000:
                        out[(g, q)] = (n, W, v)
                        break
        return out

    def _run(self, spark, groups, qs):
        from flatbread_spark.operators.ranking import (
            group_weighted_percentiles,
        )

        rows = [
            (g, i, v, w)
            for g, pairs in groups.items()
            for i, (v, w) in enumerate(pairs)
        ]
        df = spark.createDataFrame(rows, "g string, k bigint, v bigint, w bigint")
        return {
            (r["g"], r["q_ppm"]): (r["n"], r["total_w"], r["v"])
            for r in group_weighted_percentiles(
                df, "g", "v", "w", "k", qs
            ).collect()
        }

    def test_matches_python_per_group(self, spark):
        groups = {
            "en": [(5, 100), (1000, 1), (7, 3)],
            "de": [(10, 1), (20, 1), (30, 1)],
            "zz": [(9, 0)],
        }
        qs = [250_000, 500_000, 990_000, 1_000_000]
        assert self._run(spark, groups, qs) == self._oracle(groups, qs)

    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 40),
                      st.integers(0, 15)),
            min_size=1, max_size=30,
        ).filter(lambda ps: any(w > 0 for _, _, w in ps)),
        qs=st.lists(st.integers(1, 1_000_000), min_size=1, max_size=3,
                    unique=True),
    )
    @settings(**HSET)
    def test_property_matches_oracle(self, spark, pairs, qs):
        groups = {}
        for g, v, w in pairs:
            groups.setdefault(f"g{g}", []).append((v, w))
        assert self._run(spark, groups, qs) == self._oracle(groups, qs)


# ---------------------------------------------------------------- vector_audit
class TestVectorAudit:
    def test_counts_and_percentiles(self, spark):
        from flatbread_spark.operators.curation import vector_audit

        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 2.0, 0.0]),
            (2, None),
            (3, [1.0, 2.0]),
            (4, [float("nan"), 1.0, 0.0]),
            (5, [0.0, 0.0, 0.0]),
            (6, [3.0, 4.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        r = vector_audit(df, q_ppm=(500_000, 1_000_000)).collect()[0]
        assert (r["n_vecs"], r["n_null"], r["n_ragged"], r["n_nan"],
                r["n_zero"], r["dim"]) == (7, 1, 1, 1, 1, 3)
        # valid norm_sq sorted: [0, 1, 4, 25]
        assert r["p50_normsq_e6"] == 1_000_000
        assert r["p100_normsq_e6"] == 25_000_000

    def test_modal_dim_inference(self, spark):
        from flatbread_spark.operators.curation import vector_audit

        rows = [(0, [1.0, 1.0]), (1, [2.0, 2.0]), (2, [1.0, 2.0, 3.0])]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        r = vector_audit(df, q_ppm=(1_000_000,)).collect()[0]
        assert r["dim"] == 2 and r["n_ragged"] == 1

    def test_all_null_raises(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.curation import vector_audit

        df = spark.createDataFrame(
            [(0, None)], "vec_id bigint, embedding array<double>"
        )
        with _pytest.raises(ValueError):
            vector_audit(df)


# --------------------------------------------------------------- interval_join
class TestIntervalJoin:
    def _run(self, spark, L, R, width):
        from flatbread_spark.operators.asof import interval_join

        ldf = spark.createDataFrame(L, "k string, lid bigint, ls bigint, le bigint")
        rdf = spark.createDataFrame(R, "k string, rid bigint, rs bigint, re bigint")
        out = interval_join(
            ldf, rdf, ["k"], "lid", "ls", "le", "rid", "rs", "re",
            bucket_width=width,
        )
        return {(r["k"], r["l_id"], r["r_id"]) for r in out.collect()}

    @staticmethod
    def _brute(L, R):
        import itertools

        return {
            (k1, i, j)
            for (k1, i, s1, e1), (k2, j, s2, e2) in itertools.product(L, R)
            if k1 == k2 and s1 < e2 and s2 < e1
        }

    def test_matches_bruteforce_multiwidth(self, spark):
        import random

        rng = random.Random(5)
        L = [("k%d" % (i % 2), i, rng.randrange(0, 100), 0) for i in range(25)]
        L = [(k, i, s, s + rng.randrange(1, 20)) for k, i, s, _ in L]
        R = [("k%d" % (j % 2), j, rng.randrange(0, 100), 0) for j in range(20)]
        R = [(k, j, s, s + rng.randrange(1, 25)) for k, j, s, _ in R]
        exp = self._brute(L, R)
        for width in (1, 7, 16, 1000):
            assert self._run(spark, L, R, width) == exp, width

    def test_half_open_boundaries(self, spark):
        # [0,10) and [10,20): touching endpoints do NOT overlap
        L = [("k", 1, 0, 10)]
        R = [("k", 2, 10, 20), ("k", 3, 9, 10)]
        assert self._run(spark, L, R, 4) == {("k", 1, 3)}

    def test_empty_intervals_dropped(self, spark):
        L = [("k", 1, 5, 5)]          # empty: start == end
        R = [("k", 2, 0, 100)]
        assert self._run(spark, L, R, 10) == set()

    def test_mega_interval_fails_loudly(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.asof import interval_join

        ldf = spark.createDataFrame(
            [("k", 1, 0, 10**9)], "k string, lid bigint, ls bigint, le bigint"
        )
        rdf = spark.createDataFrame(
            [("k", 2, 0, 10)], "k string, rid bigint, rs bigint, re bigint"
        )
        with _pytest.raises(Exception):
            interval_join(
                ldf, rdf, ["k"], "lid", "ls", "le", "rid", "rs", "re",
                bucket_width=4, max_buckets_per_row=64,
            ).collect()

    def test_width_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.asof import interval_join

        df = spark.createDataFrame([("k", 1, 0, 1)], "k string, lid bigint, ls bigint, le bigint")
        with _pytest.raises(ValueError):
            interval_join(df, df, ["k"], "lid", "ls", "le", "lid", "ls",
                          "le", bucket_width=0)


# ------------------------------------------------------ sample_exact_n_per_group
class TestSampleExactNPerGroup:
    def test_per_group_size_prefix_and_invariance(self, spark):
        from flatbread_spark.operators.sampling import (
            sample_exact_n_per_group,
        )

        rows = [(i, "g%d" % (i % 3)) for i in range(120)]
        df = spark.createDataFrame(rows, "k bigint, g string")
        s5 = {}
        for r in sample_exact_n_per_group(df, "k", "g", 5).collect():
            s5.setdefault(r["g"], []).append((r["sample_rank"], r["k"]))
        assert all(len(v) == 5 for v in s5.values()) and len(s5) == 3
        s3 = {}
        for r in sample_exact_n_per_group(df, "k", "g", 3).collect():
            s3.setdefault(r["g"], []).append((r["sample_rank"], r["k"]))
        for g in s5:
            assert sorted(s3[g]) == sorted(s5[g])[:3]
        sp = {}
        for r in sample_exact_n_per_group(
            df.repartition(13), "k", "g", 5
        ).collect():
            sp.setdefault(r["g"], []).append((r["sample_rank"], r["k"]))
        assert {g: sorted(v) for g, v in sp.items()} == {
            g: sorted(v) for g, v in s5.items()
        }

    def test_small_group_truncates(self, spark):
        from flatbread_spark.operators.sampling import (
            sample_exact_n_per_group,
        )

        df = spark.createDataFrame([(1, "g"), (2, "g")], "k bigint, g string")
        assert sample_exact_n_per_group(df, "k", "g", 10).count() == 2

    def test_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.sampling import (
            sample_exact_n_per_group,
        )

        df = spark.createDataFrame([(1, "g")], "k bigint, g string")
        with _pytest.raises(ValueError):
            sample_exact_n_per_group(df, "k", "g", -1)


# ------------------------------------------------------------ windowed_ttr_ppm
class TestWindowedTtr:
    @staticmethod
    def _oracle(text, w):
        import math

        toks = text.split()
        if not toks:
            return None
        n_win = math.ceil(len(toks) / w)
        ppms = [
            len(set(toks[i * w:(i + 1) * w])) * 1_000_000
            // len(toks[i * w:(i + 1) * w])
            for i in range(n_win)
        ]
        return sum(ppms) // n_win

    def test_matches_python(self, spark):
        from flatbread_spark.functions.text import windowed_ttr_ppm

        cases = [
            "a b c d e f g h i j",
            "a a a a a a a a a a",
            "a b a b a b a b a b a b a",
            "x",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(cases)], "id bigint, text string"
        )
        out = {
            r["id"]: r["ttr"]
            for r in df.select(
                "id", windowed_ttr_ppm(F.col("text"), 5).alias("ttr")
            ).collect()
        }
        for i, t in enumerate(cases):
            assert out[i] == self._oracle(t, 5), t

    def test_length_bias_fixed(self, spark):
        """A long repetitive doc scores low even though every WINDOW-sized
        slice of a diverse doc scores high — the windowing point."""
        from flatbread_spark.functions.text import windowed_ttr_ppm

        diverse = " ".join(f"w{i}" for i in range(500))
        stuffed = " ".join(["buy now cheap deal"] * 125)
        df = spark.createDataFrame(
            [(1, diverse), (2, stuffed)], "id bigint, text string"
        )
        out = {
            r["id"]: r["ttr"]
            for r in df.select(
                "id", windowed_ttr_ppm(F.col("text"), 50).alias("ttr")
            ).collect()
        }
        assert out[1] == 1_000_000 and out[2] < 200_000

    def test_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.functions.text import windowed_ttr_ppm

        with _pytest.raises(ValueError):
            windowed_ttr_ppm(F.col("text"), 0)


@given(
    L=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 60), st.integers(1, 15)),
        min_size=1, max_size=15,
    ),
    R=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 60), st.integers(1, 15)),
        min_size=1, max_size=15,
    ),
    width=st.integers(1, 40),
)
@settings(**HSET)
def test_interval_join_property_matches_bruteforce(spark, L, R, width):
    """Random half-open intervals on two keys, any bucket width: banded
    results must equal the brute-force overlap set."""
    import itertools

    from flatbread_spark.operators.asof import interval_join

    Lr = [(f"k{k}", i, s, s + d) for i, (k, s, d) in enumerate(L)]
    Rr = [(f"k{k}", j, s, s + d) for j, (k, s, d) in enumerate(R)]
    ldf = spark.createDataFrame(Lr, "k string, lid bigint, ls bigint, le bigint")
    rdf = spark.createDataFrame(Rr, "k string, rid bigint, rs bigint, re bigint")
    got = {
        (r["k"], r["l_id"], r["r_id"])
        for r in interval_join(
            ldf, rdf, ["k"], "lid", "ls", "le", "rid", "rs", "re",
            bucket_width=width,
        ).collect()
    }
    exp = {
        (k1, i, j)
        for (k1, i, s1, e1), (k2, j, s2, e2) in itertools.product(Lr, Rr)
        if k1 == k2 and s1 < e2 and s2 < e1
    }
    assert got == exp
