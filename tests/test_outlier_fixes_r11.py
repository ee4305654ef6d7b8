"""Round-11 driver-outlier fix pins (VERDICT r10 #2).

The four ≥4× driver/local bench outliers were all multi-job queries; the
fixes cut Spark job counts (the contention-amplified fixed cost) without
touching values. These tests pin the machinery the fixes introduced:

- ``session.no_adaptive_execution``: restores the conf on success AND on
  error, is reentrant (nested two-phase calls), and never leaks a
  disabled AQE into the caller's session;
- ``scalable_pos(with_total=True)``: the piggybacked total equals the
  exact row count and the positions are byte-identical to the
  ``with_total=False`` path (same plan, same checkpoint discipline);
- ``join_estimate`` self-join fast path: profiling A ⋈ A through
  ``sameSemantics`` produces exactly the rows of the general two-sided
  path run over value-identical inputs with DIFFERENT lineage.
"""
import pytest
from pyspark.sql import functions as F


def test_no_adaptive_execution_restores_and_nests(spark):
    from flatbread_spark.session import no_adaptive_execution

    key = "spark.sql.adaptive.enabled"
    before = spark.conf.get(key)
    with no_adaptive_execution(spark):
        assert spark.conf.get(key) == "false"
        with no_adaptive_execution(spark):  # reentrant: nested two-phase
            assert spark.conf.get(key) == "false"
        # inner exit restores to the value the inner context saw ("false"),
        # not the session default — the outer context owns the restore
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == before


def test_no_adaptive_execution_restores_on_error(spark):
    from flatbread_spark.session import no_adaptive_execution

    key = "spark.sql.adaptive.enabled"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError, match="boom"):
        with no_adaptive_execution(spark):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_scalable_pos_with_total_matches_count_and_positions(spark):
    from flatbread_spark.operators.ranking import scalable_pos

    df = spark.range(0, 97).select(
        (F.col("id") * 37 % 97).alias("k"), F.col("id").alias("v")
    )
    ranked, n = scalable_pos(df, [F.col("k"), F.col("v")], with_total=True)
    assert n == 97
    plain = scalable_pos(df, [F.col("k"), F.col("v")])
    got = sorted((r["k"], r["v"], r["__pos__"]) for r in ranked.collect())
    want = sorted((r["k"], r["v"], r["__pos__"]) for r in plain.collect())
    assert got == want
    # dense 1..n over the order — the contract the bucket/percentile
    # formulas consume the piggybacked n against
    assert sorted(p for _, _, p in got) == [float(i) for i in range(1, 98)]


def test_scalable_pos_with_total_empty_frame(spark):
    from flatbread_spark.operators.ranking import scalable_pos

    df = spark.range(0, 10).filter(F.col("id") < 0)
    ranked, n = scalable_pos(df, [F.col("id")], with_total=True)
    assert n == 0
    assert ranked.count() == 0


def test_dup_source_matrix_matches_bruteforce_oracle(spark):
    """Property sweep for the round-11 HOF rewrite (single-lineage pair
    expansion): randomized (source, content) frames vs a brute-force
    Python pair count. Guards the 1-based slice index arithmetic
    (``slice(__arr, i + 2, …)``), the sorted-array src_a <= src_b
    invariant, and the ``np > 0`` diagonal filter (single-copy groups
    contribute neither pairs nor fingerprints)."""
    import itertools
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flatbread_spark.operators.dedup import dup_source_matrix

    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 6)),
            min_size=1, max_size=40,
        )
    )
    @settings(max_examples=8, deadline=None)
    def check(rows):
        data = [(i, f"s{s}", f"c{c}") for i, (s, c) in enumerate(rows)]
        df = spark.createDataFrame(data, "id bigint, src string, c string")
        got = {
            (r["src_a"], r["src_b"]): (r["n_fingerprints"], r["n_pairs"])
            for r in dup_source_matrix(df, "id", "c", "src").collect()
        }
        by_c = defaultdict(lambda: defaultdict(int))
        for _i, s, c in data:
            by_c[c][s] += 1
        want_fp = defaultdict(int)
        want_np = defaultdict(int)
        for _c, srcs in by_c.items():
            for s, n in srcs.items():
                if n >= 2:
                    want_fp[(s, s)] += 1
                    want_np[(s, s)] += n * (n - 1) // 2
            for sa, sb in itertools.combinations(sorted(srcs), 2):
                want_fp[(sa, sb)] += 1
                want_np[(sa, sb)] += srcs[sa] * srcs[sb]
        want = {k: (want_fp[k], want_np[k]) for k in want_fp}
        assert got == want

    check()


def test_join_estimate_self_path_matches_general_path(spark):
    from flatbread_spark.operators.skew import join_estimate

    rows = [(k, i) for k in ("a", "b", "c") for i in range(k != "a" and 3 or 5)]
    df = spark.createDataFrame(rows, ["k", "payload"])
    # different lineage, identical values: forces the general two-groupBy
    # path (filter+projection reorder defeats canonical-plan equality)
    other = (
        spark.createDataFrame(rows, ["k", "payload"])
        .withColumn("noise", F.lit(1))
        .drop("noise")
    )
    fast = join_estimate(df, df, ["k"], top_k=10)
    slow = join_estimate(df, other, ["k"], top_k=10)
    key = lambda r: r["rank"]  # noqa: E731
    f = sorted(([r[c] for c in fast.columns] for r in fast.collect()))
    s = sorted(([r[c] for c in slow.columns] for r in slow.collect()))
    assert fast.columns == slow.columns
    assert f == s
    # spot-check the identity on the fast path: est_rows = sum n_k^2
    est = {r["key"]: r for r in fast.collect()}
    assert est["a"]["n_pairs"] == 25 and est["a"]["est_rows"] == 25 + 9 + 9
