"""Round-15 operators: count-min sketch (build/estimate/mergeability),
within-corpus n-gram containment pairs (the Jaccard asymmetric-inclusion
blind spot), and the percentile_approx error-bound contract — each checked
against pure-Python references on adversarial shapes (heavy ties, subset
inclusion, singleton groups, disjoint-shard merges)."""
import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------ count-min sketch
class TestCountMin:
    def _keys(self, spark):
        # skewed: 'a' x50, 'b' x7, 'c' x1 (+ noise keys)
        rows = (
            [("a",)] * 50 + [("b",)] * 7 + [("c",)]
            + [(f"n{i}",) for i in range(40)]
        )
        return spark.createDataFrame(rows, "k string")

    def test_estimate_never_undercounts(self, spark):
        from flatbread_spark.operators.sketches import cms_build, cms_estimate

        df = self._keys(spark)
        cells = cms_build(df, "k", depth=4, width=16)  # tight width: collisions
        truth = {r["k"]: r["n"] for r in
                 df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
        est = {
            r["k"]: r["cms_est"]
            for r in cms_estimate(
                cells, df.select("k").distinct(), "k", depth=4, width=16
            ).collect()
        }
        assert set(est) == set(truth)
        for k, t in truth.items():
            assert est[k] >= t, f"CMS undercounted {k}: {est[k]} < {t}"

    def test_cells_bounded_by_depth_width(self, spark):
        from flatbread_spark.operators.sketches import cms_build

        cells = cms_build(self._keys(spark), "k", depth=3, width=8).collect()
        assert len(cells) <= 3 * 8
        assert all(0 <= r["col"] < 8 and 0 <= r["r"] < 3 for r in cells)
        # total mass per row == N (CMS row sums are exact counts)
        n = sum(1 for _ in self._keys(spark).collect())
        by_row = {}
        for r in cells:
            by_row[r["r"]] = by_row.get(r["r"], 0) + r["cell"]
        assert set(by_row.values()) == {n}

    def test_merge_is_cell_addition(self, spark):
        """The 100 TB contract: CMS of a union == cellwise sum of the two
        shard sketches (same depth/width/salt)."""
        from flatbread_spark.operators.sketches import cms_build

        df = self._keys(spark)
        a = df.filter(F.crc32(F.col("k")) % 2 == 0)
        b = df.filter(F.crc32(F.col("k")) % 2 == 1)

        def cellmap(frame):
            return {
                (r["r"], r["col"]): r["cell"]
                for r in cms_build(frame, "k", depth=4, width=16).collect()
            }

        whole, ca, cb = cellmap(df), cellmap(a), cellmap(b)
        merged = dict(ca)
        for rc, v in cb.items():
            merged[rc] = merged.get(rc, 0) + v
        assert merged == whole

    def test_null_keys_carry_no_frequency(self, spark):
        """NULL keys would hash to a NULL column index and mint (r, NULL)
        cells — past the depth×width bound, invisible to probes,
        unaccounted in row sums. The contract drops them on both sides."""
        from flatbread_spark.operators.sketches import cms_build, cms_estimate

        rows = [("a",)] * 3 + [(None,)] * 5 + [("b",)]
        df = spark.createDataFrame(rows, "k string")
        cells = cms_build(df, "k", depth=3, width=8)
        collected = cells.collect()
        assert all(r["col"] is not None for r in collected)
        by_row = {}
        for r in collected:
            by_row[r["r"]] = by_row.get(r["r"], 0) + r["cell"]
        assert set(by_row.values()) == {4}  # non-NULL occurrences only
        probe = spark.createDataFrame([("a",), (None,)], "k string")
        est = cms_estimate(cells, probe, "k", depth=3, width=8).collect()
        assert [(r["k"], r["cms_est"] >= 3) for r in est] == [("a", True)]

    def test_weighted_cells_equal_pre_aggregated_counts(self, spark):
        """The weight lane: building from (key, weight) rows must equal
        building from the exploded occurrence stream — i.e. CMS cells are
        linear in the weights, the property that lets the 100 TB path
        sketch pre-aggregated per-shard counts instead of raw tokens."""
        from flatbread_spark.operators.sketches import cms_build

        occ = self._keys(spark)
        agg = occ.groupBy("k").agg(F.count(F.lit(1)).alias("w"))

        def cellmap(cells):
            return {(r["r"], r["col"]): r["cell"] for r in cells.collect()}

        assert cellmap(
            cms_build(agg, "k", depth=4, width=16, weight_col="w")
        ) == cellmap(cms_build(occ, "k", depth=4, width=16))

    def test_unseen_key_estimate_is_bias_only(self, spark):
        from flatbread_spark.operators.sketches import cms_build, cms_estimate

        df = self._keys(spark)
        cells = cms_build(df, "k", depth=4, width=4096)  # wide: no collisions
        probe = spark.createDataFrame([("zz_never",)], "k string")
        est = cms_estimate(cells, probe, "k", depth=4, width=4096).collect()
        assert est[0]["cms_est"] == 0


# --------------------------------------------------- ngram containment pairs
class TestContainmentPairs:
    def test_subset_inclusion_flags_where_jaccard_blind(self, spark):
        from flatbread_spark.operators.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        short = "alpha beta gamma delta epsilon zeta"
        filler = " ".join(f"w{i} x{i} y{i} z{i}" for i in range(30))
        rows = [
            (1, short),                       # quoted wholesale in 2
            (2, filler + " " + short),        # long host document
            (3, "unrelated text entirely different tokens here now"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        cont = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in ngram_containment_pairs(
                df, "doc_id", "text", n=4, threshold=0.9
            ).collect()
        }
        assert cont == {(1, 2): 1.0}
        # Jaccard at the same meaningful threshold misses the pair entirely
        jac = ngram_jaccard_pairs(
            df, "doc_id", "text", n=4, threshold=0.5
        ).collect()
        assert jac == []

    def test_threshold_and_block(self, spark):
        from flatbread_spark.operators.dedup import ngram_containment_pairs

        text = "one two three four five six seven"
        rows = [
            (1, "en", text),
            (2, "en", text + " extra tail tokens here"),
            (3, "de", text),  # identical but different block: never paired
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
        out = ngram_containment_pairs(
            df, "doc_id", "text", n=4, threshold=0.9, block_col="lang"
        ).collect()
        assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]

    def test_identical_docs_containment_one(self, spark):
        from flatbread_spark.operators.dedup import ngram_containment_pairs

        rows = [(1, "a b c d e"), (2, "a b c d e")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = ngram_containment_pairs(df, "doc_id", "text", n=4,
                                      threshold=0.9).collect()
        assert [(r["id_a"], r["id_b"], r["containment"]) for r in out] == [
            (1, 2, 1.0)
        ]


# ------------------------------------------------- percentile_approx contract
class TestApproxPercentileContract:
    def test_bound_holds_on_ties_and_singletons(self, spark):
        from flatbread_spark.operators.ranking import approx_percentile_check

        # group 'tied': 1000 rows, 90% the same value (rank interval spans
        # most of the group); group 'solo': a singleton
        rows = [("tied", i, 5 if i % 10 else i) for i in range(1000)]
        rows += [("solo", 10_000, 42)]
        df = spark.createDataFrame(rows, "g string, k bigint, v bigint")
        out = approx_percentile_check(
            df, "g", "v", "k", [50_000, 500_000, 990_000], accuracy=100
        ).collect()
        assert len(out) == 6
        assert all(r["rank_within_bound"] for r in out)
        solo = [r for r in out if r["g"] == "solo"]
        assert all(r["v"] == 42 and r["n"] == 1 for r in solo)

    def test_empty_inputs_yield_empty_not_crash(self, spark):
        """The bug class the event-family sweep caught in r6, pinned for
        the round-15 ops: empty frames flow through to empty results."""
        from pyspark.sql import functions as F

        from flatbread_spark.operators.dedup import ngram_containment_pairs
        from flatbread_spark.operators.ranking import approx_percentile_check
        from flatbread_spark.operators.sketches import (
            cms_build,
            cms_estimate,
            cms_frequency_check,
        )

        empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
        assert cms_frequency_check(empty_docs, "text").count() == 0
        cells = cms_build(
            empty_docs.select(F.col("text").alias("k")), "k"
        )
        assert cells.count() == 0
        probe = spark.createDataFrame([("x",)], "k string")
        # unseen key against an empty sketch: bias floor is 0, not NULL
        assert cms_estimate(cells, probe, "k").collect()[0]["cms_est"] == 0
        assert (
            ngram_containment_pairs(empty_docs, "doc_id", "text").count() == 0
        )
        empty_v = spark.createDataFrame([], "g string, k bigint, v bigint")
        assert (
            approx_percentile_check(
                empty_v, "g", "v", "k", [500_000]
            ).count()
            == 0
        )

    def test_null_values_carry_no_rank(self, spark):
        """NULL values have three different semantics across the contract's
        sides (window ranks them first, percentile_approx skips them, the
        probe sums drop them) — the operator must drop them up front so a
        conforming sketch can't false-fail and the low quantile can't be
        a NULL row."""
        from flatbread_spark.operators.ranking import approx_percentile_check

        rows = [("g", i, None) for i in range(10)] + [
            ("g", 100 + i, (i + 1) * 10) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "g string, k bigint, v bigint")
        out = approx_percentile_check(
            df, "g", "v", "k", [50_000, 500_000, 990_000], accuracy=100
        ).collect()
        assert len(out) == 3
        assert all(r["n"] == 100 for r in out)          # NULLs not counted
        assert all(r["v"] is not None for r in out)     # never a NULL row
        assert all(r["rank_within_bound"] for r in out)

    def test_null_group_key_is_a_graded_stratum(self, spark):
        """A NULL group key (unclassified lang) is a real stratum: plain
        EqualTo joins would silently drop its contract rows, letting a
        bound violation there pass ungraded — the null-safe joins keep it
        on the hook."""
        from flatbread_spark.operators.ranking import approx_percentile_check

        rows = [(None, i, i) for i in range(50)] + [
            ("en", 100 + i, i * 2) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "g string, k bigint, v bigint")
        out = approx_percentile_check(
            df, "g", "v", "k", [500_000], accuracy=100
        ).collect()
        by_g = {r["g"]: r for r in out}
        assert set(by_g) == {None, "en"}
        assert by_g[None]["n"] == 50 and by_g[None]["rank_within_bound"]
        assert by_g["en"]["rank_within_bound"]

    def test_exact_value_is_nearest_rank(self, spark):
        from flatbread_spark.operators.ranking import approx_percentile_check

        df = spark.createDataFrame(
            [("g", i, i * 10) for i in range(1, 11)], "g string, k bigint, v bigint"
        )
        out = {
            r["q_ppm"]: r["v"]
            for r in approx_percentile_check(
                df, "g", "v", "k", [500_000, 1_000_000], accuracy=1000
            ).collect()
        }
        # nearest-rank: p50 of 1..10 -> pos ceil(5) = 5 -> value 50
        assert out == {500_000: 50, 1_000_000: 100}
