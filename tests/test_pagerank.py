"""pagerank_fixed: integer fixed-point PageRank vs a pure-Python replay."""
import pytest
from pyspark.sql import functions as F


def _py_pagerank(edges, iters=3, scale=10**12, dpct=85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((100 - dpct) * (scale // n)) // 100
    rank = {v: scale // n for v in nodes}
    for _ in range(iters):
        inbound = {v: 0 for v in nodes}
        for s, d in edges:
            inbound[d] += rank[s] // outdeg[s]
        rank = {v: base + (dpct * inbound[v]) // 100 for v in nodes}
    return rank


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (5, 4), (5, 1),
    (6, 1), (2, 1), (3, 2),
]


class TestPagerankFixed:
    def _run(self, spark, edges, **kw):
        df = spark.createDataFrame(edges, "s bigint, d bigint")
        from flatbread_spark.operators.graph import pagerank_fixed

        return {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixed(df, "s", "d", **kw).collect()
        }

    def test_matches_pure_python(self, spark):
        got = self._run(spark, EDGES, iters=3)
        assert got == _py_pagerank(EDGES, iters=3)

    def test_more_iterations_and_params(self, spark):
        got = self._run(spark, EDGES, iters=5, scale=10**9, damping_pct=70)
        assert got == _py_pagerank(EDGES, iters=5, scale=10**9, dpct=70)

    def test_hub_outranks_leaf(self, spark):
        got = self._run(spark, EDGES, iters=3)
        # node 1 receives from 3,4,5,6,2; node 6 receives nothing
        assert got[1] > got[6]

    def test_duplicate_edges_collapse(self, spark):
        got = self._run(spark, EDGES + EDGES[:4], iters=2)
        assert got == _py_pagerank(EDGES, iters=2)

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame(EDGES, "s bigint, d bigint")
        from flatbread_spark.operators.graph import pagerank_fixed

        with pytest.raises(ValueError, match="iters"):
            pagerank_fixed(df, "s", "d", iters=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank_fixed(df, "s", "d", damping_pct=100)

    def test_partitioning_invariant(self, spark):
        df = spark.createDataFrame(EDGES, "s bigint, d bigint")
        from flatbread_spark.operators.graph import pagerank_fixed

        a = {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixed(df.repartition(7), "s", "d").collect()
        }
        b = {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixed(df.coalesce(1), "s", "d").collect()
        }
        assert a == b


# --------------------------------------------------------------- triangle_count
class TestTriangleCount:
    @staticmethod
    def _brute(E):
        import itertools

        from collections import Counter

        E = {tuple(sorted(e)) for e in E if e[0] != e[1]}
        nodes = sorted({n for e in E for n in e})
        t = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in E and (b, c) in E and (a, c) in E
        )
        deg = Counter()
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        w = sum(d * (d - 1) // 2 for d in deg.values())
        cc = 3 * t * 1_000_000 // w if w else 0
        return len(nodes), len(E), w, t, cc

    def _run(self, spark, E):
        from flatbread_spark.operators.graph import triangle_count

        df = spark.createDataFrame([(a, b) for a, b in E], "s bigint, d bigint")
        r = triangle_count(df, "s", "d").collect()[0]
        return (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"],
                r["clustering_ppm"])

    def test_known_shapes(self, spark):
        # triangle: 3 wedges, 1 triangle, clustering 1.0
        assert self._run(spark, [(1, 2), (2, 3), (1, 3)]) == (3, 3, 3, 1,
                                                              1_000_000)
        # path: 2 wedges, no triangles
        assert self._run(spark, [(1, 2), (2, 3), (3, 4)]) == (4, 3, 2, 0, 0)
        # K4: 12 wedges, 4 triangles, clustering 1.0
        k4 = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 1), (2, 4)]
        assert self._run(spark, k4) == (4, 6, 12, 4, 1_000_000)

    def test_self_loops_and_duplicates_collapse(self, spark):
        E = [(1, 2), (2, 1), (1, 1), (1, 3), (2, 3)]
        assert self._run(spark, E) == self._brute(E)

    def test_hub_skew_matches_bruteforce(self, spark):
        """A celebrity hub (star + random chords) — the shape the degree
        orientation exists for."""
        import random

        rng = random.Random(13)
        E = [(0, i) for i in range(1, 25)]
        E += [(rng.randrange(1, 25), rng.randrange(1, 25)) for _ in range(40)]
        assert self._run(spark, E) == self._brute(E)


# -------------------------------------------------------------- degree_spectrum
class TestDegreeSpectrum:
    def test_star_plus_triangle(self, spark):
        from flatbread_spark.operators.graph import degree_spectrum

        E = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (10, 12)]
        df = spark.createDataFrame(E, "s bigint, d bigint")
        got = {
            r["bucket_lo"]: (r["bucket_hi"], r["n_nodes"],
                             r["n_edge_endpoints"])
            for r in degree_spectrum(df, "s", "d").collect()
        }
        # leaves deg 1 -> bucket 1; triangle deg 2 -> bucket 2; hub deg 5
        # -> bucket 4
        assert got == {1: (2, 5, 5), 2: (4, 3, 6), 4: (8, 1, 5)}

    def test_endpoints_sum_to_twice_edges(self, spark):
        import random

        from flatbread_spark.operators.graph import degree_spectrum

        rng = random.Random(21)
        E = {(rng.randrange(30), rng.randrange(30)) for _ in range(80)}
        E = [(a, b) for a, b in E if a != b]
        df = spark.createDataFrame(E, "s bigint, d bigint")
        rows = degree_spectrum(df, "s", "d").collect()
        n_edges = len({tuple(sorted(e)) for e in E})
        assert sum(r["n_edge_endpoints"] for r in rows) == 2 * n_edges


# ------------------------------------------------------------ bipartite_project
class TestBipartiteProject:
    def test_shared_key_counts(self, spark):
        from flatbread_spark.operators.graph import bipartite_project

        rows = [  # key, entity
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "x"),
            (4, "a"), (4, "a"),          # duplicate membership collapses
        ]
        df = spark.createDataFrame(rows, "k bigint, e string")
        got = {
            (r["entity_a"], r["entity_b"]): r["n_shared"]
            for r in bipartite_project(df, "k", "e").collect()
        }
        assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}

    def test_min_shared_filters(self, spark):
        from flatbread_spark.operators.graph import bipartite_project

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
        df = spark.createDataFrame(rows, "k bigint, e string")
        got = {
            (r["entity_a"], r["entity_b"])
            for r in bipartite_project(df, "k", "e", min_shared=2).collect()
        }
        assert got == {("a", "b")}

    def test_validation(self, spark):
        import pytest as _pytest

        from flatbread_spark.operators.graph import bipartite_project

        df = spark.createDataFrame([(1, "a")], "k bigint, e string")
        with _pytest.raises(ValueError):
            bipartite_project(df, "k", "e", min_shared=0)
