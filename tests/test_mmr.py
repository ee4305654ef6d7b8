"""MMR diversity re-ranking: exact integer greedy vs a pure-Python oracle."""
import math

import pytest


def _codes(v):
    s = max(abs(x) for x in v) / 127.0
    return [0] * len(v) if s == 0 else [math.floor(x / s + 0.5) for x in v]


def _dot(a, b):
    return sum(x * y for x, y in zip(a, b))


def _oracle(C, qid, k_cand, n_sel, lam):
    rels = sorted(
        ((_dot(C[qid], C[i]), -i) for i in C if i != qid), reverse=True
    )
    cand = [-i for _, i in rels[:k_cand]]
    relmap = {i: _dot(C[qid], C[i]) for i in cand}
    picked, max_sim, exp = [], {}, []
    for r in range(min(n_sel, len(cand))):
        best = None
        for i in sorted(cand):
            if i in picked:
                continue
            pen = (1_000_000 - lam) * max_sim[i] if picked else 0
            sc = lam * relmap[i] - pen
            if best is None or sc > best[1]:
                best = (i, sc)
        picked.append(best[0])
        exp.append((r + 1, best[0], best[1]))
        for i in cand:
            s = _dot(C[i], C[best[0]])
            max_sim[i] = max(max_sim.get(i, s), s)
    return exp


class TestMmrRerank:
    def _fixture(self, spark, seed, n=30, dim=8):
        import random

        rng = random.Random(seed)
        vecs = [(i, [rng.uniform(-3, 3) for _ in range(dim)]) for i in range(n)]
        df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
        C = {
            r["vec_id"]: _codes([float(x) for x in r["embedding"]])
            for r in df.collect()
        }
        return df, C

    @pytest.mark.parametrize("lam", [0, 600_000, 1_000_000])
    def test_matches_python_greedy(self, spark, lam):
        from flatbread_spark.operators.similarity import mmr_rerank

        df, C = self._fixture(spark, seed=lam + 1)
        out = mmr_rerank(
            df, df.filter("vec_id < 2"), k_candidates=10, n_select=4,
            lambda_ppm=lam,
        ).collect()
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["neighbor_id"], r["mmr_score"])
            )
        for qid in (0, 1):
            got[qid].sort()
            assert got[qid] == _oracle(C, qid, 10, 4, lam), (qid, lam)

    def test_diversity_spreads_clusters(self, spark):
        """Two tight clusters: pure relevance picks all from the nearer
        cluster; MMR with strong diversity pulls from both."""
        from flatbread_spark.operators.similarity import mmr_rerank

        near = [(i, [10.0 + 0.01 * i, 0.0]) for i in range(1, 4)]
        far = [(10 + i, [0.0, 8.0 + 0.01 * i]) for i in range(3)]
        q = [(99, [1.0, 0.1])]
        df = spark.createDataFrame(
            near + far + q, "vec_id bigint, embedding array<float>"
        )
        rel_only = mmr_rerank(df, df.filter("vec_id = 99"), k_candidates=6,
                              n_select=3, lambda_ppm=1_000_000).collect()
        divers = mmr_rerank(df, df.filter("vec_id = 99"), k_candidates=6,
                            n_select=3, lambda_ppm=300_000).collect()
        rel_ids = {r["neighbor_id"] for r in rel_only}
        div_ids = {r["neighbor_id"] for r in divers}
        assert rel_ids <= {1, 2, 3}
        assert any(i >= 10 for i in div_ids)

    def test_validation(self, spark):
        from flatbread_spark.operators.similarity import mmr_rerank

        df = spark.createDataFrame([(0, [1.0])], "vec_id bigint, embedding array<float>")
        with pytest.raises(ValueError):
            mmr_rerank(df, df, n_select=0)
        with pytest.raises(ValueError):
            mmr_rerank(df, df, k_candidates=2, n_select=5)
        with pytest.raises(ValueError):
            mmr_rerank(df, df, lambda_ppm=2_000_000)
