"""Round-12 knn_bruteforce shortlist-kernel pins.

The exact path's hot loop moved from an interpreted HOF double dot per
(query, corpus) pair (materialized through a BroadcastNestedLoopJoin +
corpus-sized rank window) to one numpy matmul per Arrow slab emitting a
value-superset shortlist. The VALUE contract is unchanged — the
exact-decimal re-rank still decides every output — so these tests pin:

1. parity with the round-11 HOF reference shape on data WITH duplicate
   vectors (boundary ties — the case where a naive top-k selection by
   value alone could diverge from the (fast desc, id asc) window order);
2. partition invariance (slab boundaries must not change the result);
3. self-exclusion (a corpus row with a query's id never surfaces, even
   in slabs smaller than the shortlist depth where -inf masking alone
   would leak it).
"""
import random

import pytest
from pyspark.sql import functions as F

from flatbread_spark.operators.similarity import knn_bruteforce


def _reference_rows(spark, corpus, queries, k):
    """The round-11 expression-only exact path, inlined as the oracle."""
    from pyspark.sql import Window

    from flatbread_spark.functions.vectors import cosine_exact, dot_fast

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.sqrt(dot_fast(F.col("embedding"), F.col("embedding"))).alias("__qn"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        F.sqrt(dot_fast(F.col("embedding"), F.col("embedding"))).alias("__cn"),
    )
    depth = max(4 * k, k + 20)
    fast = dot_fast(F.col("__qv"), F.col("__cv")) / (
        F.col("__qn") * F.col("__cn")
    )
    from pyspark.sql import Window as W

    wf = W.partitionBy("query_id").orderBy(
        F.desc("__fast"), F.asc("neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    shortlist = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv", fast.alias("__fast"))
        .withColumn("__frank", F.row_number().over(wf))
        .filter(F.col("__frank") <= depth)
    )
    cos = cosine_exact(F.col("__qv"), F.col("__cv"))
    return sorted(
        shortlist.select(
            "query_id", "neighbor_id", F.round(cos, 6).alias("cos")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )


def _mk(spark, vecs, n_parts):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    ).repartition(n_parts)


@pytest.fixture(scope="module")
def tied_vectors():
    rnd = random.Random(7)
    dim = 8
    base = [[rnd.uniform(-1, 1) for _ in range(dim)] for _ in range(40)]
    # force boundary ties: many EXACT duplicates of a handful of vectors,
    # so fast-cosine values collide and only the id tie-break orders them
    vecs = base + [list(base[i % 5]) for i in range(30)]
    return vecs


def test_kernel_matches_hof_reference_with_ties(spark, tied_vectors):
    corpus = _mk(spark, tied_vectors, 4)
    queries = corpus.filter(F.col("vec_id") < 4)
    got = sorted(knn_bruteforce(corpus, queries, k=5).collect())
    want = _reference_rows(spark, corpus, queries, k=5)
    assert got == want


def test_kernel_partition_invariance(spark, tied_vectors):
    outs = []
    for n_parts in (1, 3, 7):
        corpus = _mk(spark, tied_vectors, n_parts)
        queries = corpus.filter(F.col("vec_id") < 3)
        outs.append(sorted(knn_bruteforce(corpus, queries, k=4).collect()))
    assert outs[0] == outs[1] == outs[2]


def test_self_pair_never_surfaces_in_tiny_slabs(spark):
    # 3 corpus rows (all slabs smaller than depth): the query's own row
    # must not appear even though every row would fit the shortlist
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]
    corpus = _mk(spark, vecs, 3)
    queries = corpus.filter(F.col("vec_id") == 0)
    rows = knn_bruteforce(corpus, queries, k=3).collect()
    assert all(r["neighbor_id"] != 0 for r in rows)
    assert {r["neighbor_id"] for r in rows} == {1, 2}
