"""Property-based sweeps for the graph family (VERDICT r7 #5): random
graphs vs pure-Python oracles, in the style of test_event_properties.py.

Pinned corners the strategies force:
- the driver-union-find / Pregel CAP BOUNDARY: every example runs
  connected_components twice, once with the cap above the edge count
  (driver path) and once with cap 0 (distributed min-label path), and the
  two must agree with each other AND the python union-find;
- SELF-LOOPS (src == dst), PARALLEL/duplicate edges, isolated nodes
  (present in the node frame, absent from every edge), and the EMPTY edge
  list;
- string node ids (the non-numeric convergence probe — a decimal cast
  would NULL out and fake an instant fixpoint);
- dangling nodes and rank-sink shapes for the fixed-point PageRank, whose
  integer recurrence the oracle replays exactly;
- hub-skew and chain shapes for triangle_count / degree_spectrum.

One Spark job per example is the cost: examples are capped small and
graphs are tiny, which is where the combinatorial corners live anyway.
"""
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# node ids 0..9; up to 16 edges incl. self-loops and duplicates
edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=0,
    max_size=16,
)


def _py_components(node_ids, edge_list):
    parent = {n: n for n in node_ids}
    for u, v in edge_list:
        parent.setdefault(u, u)
        parent.setdefault(v, v)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {n: find(n) for n in node_ids}


@given(edges=edges_st)
@settings(**SET)
def test_connected_components_both_paths_match_python(spark, edges):
    from flatbread_spark.operators.graph import connected_components

    node_ids = list(range(10))  # includes isolated nodes
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id bigint")
    e = spark.createDataFrame(
        edges or [(None, None)], "id_a bigint, id_b bigint"
    ).filter("id_a IS NOT NULL")

    want = _py_components(node_ids, edges)
    driver = {
        r["id"]: r["cluster_id"]
        for r in connected_components(nodes, e, driver_max_edges=10_000).collect()
    }
    pregel = {
        r["id"]: r["cluster_id"]
        for r in connected_components(nodes, e, driver_max_edges=0).collect()
    }
    assert driver == want
    assert pregel == want


@given(edges=edges_st)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_exact_cap_boundary(spark, edges):
    """cap == distinct undirected edge count stays on the driver path;
    cap == count-1 falls to Pregel — both must give the same labels."""
    from flatbread_spark.operators.graph import connected_components

    node_ids = list(range(10))
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id bigint")
    e = spark.createDataFrame(
        edges or [(None, None)], "id_a bigint, id_b bigint"
    ).filter("id_a IS NOT NULL")
    n_distinct = len({(u, v) for u, v in edges})
    want = _py_components(node_ids, edges)
    at_cap = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            nodes, e, driver_max_edges=n_distinct
        ).collect()
    }
    below_cap = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            nodes, e, driver_max_edges=max(n_distinct - 1, 0)
        ).collect()
    }
    assert at_cap == want
    assert below_cap == want


@given(edges=edges_st)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_string_ids(spark, edges):
    """String node ids ride the changed-label join probe (non-numeric
    convergence detection) and must match python on the same graph."""
    from flatbread_spark.operators.graph import connected_components

    node_ids = [f"n{i:02d}" for i in range(10)]
    s_edges = [(f"n{u:02d}", f"n{v:02d}") for u, v in edges]
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id string")
    e = spark.createDataFrame(
        s_edges or [(None, None)], "id_a string, id_b string"
    ).filter("id_a IS NOT NULL")
    want = _py_components(node_ids, s_edges)
    for cap in (10_000, 0):
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(nodes, e, driver_max_edges=cap).collect()
        }
        assert got == want, f"cap={cap}"


def _py_pagerank(edge_list, iters=3, scale=10**12, damping=85):
    e = sorted({(u, v) for u, v in edge_list})
    if not e:
        return {}
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    rank = {x: scale // n for x in nodes}
    base = ((100 - damping) * (scale // n)) // 100
    for _ in range(iters):
        inbound = {x: 0 for x in nodes}
        for u, v in e:
            inbound[v] += rank[u] // outdeg[u]
        rank = {x: base + (damping * inbound[x]) // 100 for x in nodes}
    return rank


@given(edges=edges_st)
@settings(**SET)
def test_pagerank_fixed_matches_integer_replay(spark, edges):
    from flatbread_spark.operators.graph import pagerank_fixed

    e = spark.createDataFrame(
        edges or [(None, None)], "s bigint, d bigint"
    ).filter("s IS NOT NULL")
    want = _py_pagerank(edges)
    got = {r["node"]: r["rank_fp"] for r in pagerank_fixed(e, "s", "d").collect()}
    assert got == want


def _py_triangles(edge_list):
    und = {(min(u, v), max(u, v)) for u, v in edge_list if u != v}
    nodes = sorted({u for u, _ in und} | {v for _, v in und})
    adj = {x: set() for x in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tris = sum(
        1
        for i, u in enumerate(nodes)
        for v in adj[u]
        if v > u
        for w in (adj[u] & adj[v])
        if w > v
    )
    wedges = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    return (
        len(nodes),
        len(und),
        wedges,
        tris,
        (3 * tris * 1_000_000) // wedges if wedges else 0,
    )


@given(edges=edges_st)
@settings(**SET)
def test_triangle_count_matches_bruteforce(spark, edges):
    from flatbread_spark.operators.graph import triangle_count

    e = spark.createDataFrame(
        edges or [(None, None)], "s bigint, d bigint"
    ).filter("s IS NOT NULL")
    n_nodes, n_edges, wedges, tris, cl = _py_triangles(edges)
    row = triangle_count(e, "s", "d").collect()
    if n_edges == 0:
        # no edges → the single stat row reports zeros (or empty frame)
        assert not row or (
            row[0]["n_edges"] == 0 and row[0]["n_triangles"] == 0
        )
        return
    r = row[0]
    assert (
        r["n_nodes"], r["n_edges"], r["n_wedges"],
        r["n_triangles"], r["clustering_ppm"],
    ) == (n_nodes, n_edges, wedges, tris, cl)


@given(edges=edges_st)
@settings(**SET)
def test_degree_spectrum_matches_python(spark, edges):
    from flatbread_spark.operators.graph import degree_spectrum

    e = spark.createDataFrame(
        edges or [(None, None)], "s bigint, d bigint"
    ).filter("s IS NOT NULL")
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    buckets = {}
    for d in deg.values():
        lo = 1 << (d.bit_length() - 1)
        n, ep = buckets.get(lo, (0, 0))
        buckets[lo] = (n + 1, ep + d)
    got = {
        r["bucket_lo"]: (r["n_nodes"], r["n_edge_endpoints"], r["bucket_hi"])
        for r in degree_spectrum(e, "s", "d").collect()
    }
    assert got == {lo: (n, ep, lo * 2) for lo, (n, ep) in buckets.items()}
