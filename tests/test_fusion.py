"""Reciprocal-rank fusion: exact integer RRF vs a pure-Python oracle."""
import pytest


def _oracle(lists, k=60, group=None):
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 10**9])
    for lst in lists:
        for doc, rank in lst:
            a = agg[doc]
            a[0] += 1_000_000 // (k + rank)
            a[1] += 1
            a[2] = min(a[2], rank)
    ordered = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[0]))
    return [
        (doc, n, best, score, i + 1)
        for i, (doc, (score, n, best)) in enumerate(ordered)
    ]


class TestRrfFuse:
    def test_matches_python(self, spark):
        from flatbread_spark.operators.fusion import rrf_fuse

        la = [(10, 1), (20, 2), (30, 3), (40, 4)]
        lb = [(30, 1), (10, 2), (99, 3)]
        dfa = spark.createDataFrame(la, "doc bigint, rank bigint")
        dfb = spark.createDataFrame(lb, "doc bigint, rank bigint")
        got = [
            (r["doc"], r["n_lists"], r["best_rank"], r["rrf_score"], r["rank"])
            for r in rrf_fuse([dfa, dfb], "doc").orderBy("rank").collect()
        ]
        assert got == _oracle([la, lb])

    def test_consensus_beats_single_head(self, spark):
        """An item ranked 2nd in both lists outranks each list's unique #1
        (the RRF property the k constant exists for)."""
        from flatbread_spark.operators.fusion import rrf_fuse

        la = [(1, 1), (7, 2)]
        lb = [(2, 1), (7, 2)]
        dfa = spark.createDataFrame(la, "doc bigint, rank bigint")
        dfb = spark.createDataFrame(lb, "doc bigint, rank bigint")
        top = rrf_fuse([dfa, dfb], "doc").orderBy("rank").first()
        assert top["doc"] == 7 and top["n_lists"] == 2

    def test_grouped_and_topn(self, spark):
        from flatbread_spark.operators.fusion import rrf_fuse

        la = [(0, 10, 1), (0, 20, 2), (1, 30, 1), (1, 40, 2)]
        lb = [(0, 20, 1), (1, 40, 1), (1, 50, 2)]
        dfa = spark.createDataFrame(la, "q bigint, doc bigint, rank bigint")
        dfb = spark.createDataFrame(lb, "q bigint, doc bigint, rank bigint")
        out = rrf_fuse([dfa, dfb], "doc", group_cols=["q"], top_n=1).collect()
        got = {r["q"]: r["doc"] for r in out}
        # q0: doc20 in both (ranks 2,1) beats doc10 (rank 1 once)
        # q1: doc40 in both (ranks 2,1) beats doc30/doc50
        assert got == {0: 20, 1: 40}
        assert all(r["rank"] == 1 for r in out)

    def test_validation(self, spark):
        from flatbread_spark.operators.fusion import rrf_fuse

        df = spark.createDataFrame([(1, 1)], "doc bigint, rank bigint")
        with pytest.raises(ValueError):
            rrf_fuse([], "doc")
        with pytest.raises(ValueError):
            rrf_fuse([df], "doc", k=-1)


# ------------------------------------------------------- hypothesis properties
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    la=st.lists(st.integers(0, 20), min_size=1, max_size=10, unique=True),
    lb=st.lists(st.integers(0, 20), min_size=1, max_size=10, unique=True),
    k=st.integers(0, 100),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rrf_matches_python_oracle(spark, la, lb, k):
    from flatbread_spark.operators.fusion import rrf_fuse

    ra = [(doc, i + 1) for i, doc in enumerate(la)]
    rb = [(doc, i + 1) for i, doc in enumerate(lb)]
    dfa = spark.createDataFrame(ra, "doc bigint, rank bigint")
    dfb = spark.createDataFrame(rb, "doc bigint, rank bigint")
    got = [
        (r["doc"], r["n_lists"], r["best_rank"], r["rrf_score"], r["rank"])
        for r in rrf_fuse([dfa, dfb], "doc", k=k).orderBy("rank").collect()
    ]
    assert got == _oracle([ra, rb], k=k)
