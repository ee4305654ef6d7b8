"""Round-10 operators: exact join-cardinality estimation, per-key rate
anomaly detection over the gap-filled grid, majority-vote label
reconciliation.

Same discipline as earlier rounds: each operator checked against an
independent pure-Python re-derivation of its contract plus its documented
determinism / guard behaviors.
"""
import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------- join_estimate
class TestJoinEstimate:
    def test_exact_cardinality(self, spark):
        from flatbread_spark.operators.skew import join_estimate

        left = spark.createDataFrame(
            [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 1 + [("only_l",)],
            "k string",
        )
        right = spark.createDataFrame(
            [("a",)] * 4 + [("b",)] * 5 + [("c",)] * 1 + [("only_r",)] * 7,
            "k string",
        )
        out = join_estimate(left, right, ["k"], top_k=10).collect()
        # exact identity: 3*4 + 2*5 + 1*1 = 23, and the real join agrees
        real = left.join(right, "k").count()
        assert real == 23
        assert all(r["est_rows"] == 23 for r in out)
        assert all(r["n_matching_keys"] == 3 for r in out)
        got = {r["key"]: (r["n_left"], r["n_right"], r["n_pairs"]) for r in out}
        assert got == {"a": (3, 4, 12), "b": (2, 5, 10), "c": (1, 1, 1)}
        assert [r["key"] for r in out] == ["a", "b", "c"]  # n_pairs desc

    def test_null_key_and_tie_break(self, spark):
        from flatbread_spark.operators.skew import join_estimate

        left = spark.createDataFrame([(None,), (None,), ("x",)], "k string")
        right = spark.createDataFrame([(None,), ("x",), ("x",)], "k string")
        out = join_estimate(left, right, ["k"], top_k=10).collect()
        # equi-join drops NULL keys — the estimate must agree with the join
        assert {r["key"] for r in out} == {"x"}
        assert out[0]["n_pairs"] == 2
        assert out[0]["est_rows"] == left.join(right, "k").count() == 2


# --------------------------------------------------------------- rate_anomaly
class TestRateAnomaly:
    def _df(self, spark):
        # key "u": steady 2/bucket for buckets 0..3, burst 9 at bucket 4,
        # silent bucket 5-6 (grid!), burst 8 at bucket 7
        rows = []
        for b in range(4):
            rows += [("u", b * 10 + i) for i in range(2)]
        rows += [("u", 40 + i) for i in range(9)]
        rows += [("u", 70 + i) for i in range(8)]
        return spark.createDataFrame(rows, "k string, ts long")

    def test_burst_flagged_integer_ratio(self, spark):
        from flatbread_spark.operators.timeseries import rate_anomaly

        out = {
            r["bucket_start"]: r
            for r in rate_anomaly(
                self._df(spark), ["k"], "ts", 10,
                trailing=3, factor_x1000=2000, min_count=4,
            ).collect()
        }
        # buckets 0..2: not enough history -> NULLs, never flagged
        for b in (0, 10, 20):
            assert out[b]["trailing_sum"] is None
            assert out[b]["ratio_x1000"] is None
            assert not out[b]["is_anomaly"]
        # bucket 3: n=2 vs trailing {2,2,2}: ratio 1000, no flag
        assert out[30]["trailing_sum"] == 6
        assert out[30]["ratio_x1000"] == 1000
        assert not out[30]["is_anomaly"]
        # bucket 4: n=9 vs {2,2,2}: ratio floor(9*3*1000/6)=4500 -> flag
        assert out[40]["ratio_x1000"] == 4500
        assert out[40]["is_anomaly"]
        # bucket 7 bursts after silence: trailing {9,0,0}=9 (grid zeros!),
        # ratio floor(8*3*1000/9)=2666 -> flag
        assert out[70]["trailing_sum"] == 9
        assert out[70]["ratio_x1000"] == 2666
        assert out[70]["is_anomaly"]
        # silent buckets 5,6 exist on the grid with n=0
        assert out[50]["n"] == 0 and out[60]["n"] == 0

    def test_all_zero_trailing_flags_without_ratio(self, spark):
        from flatbread_spark.operators.timeseries import rate_anomaly

        rows = [("u", 0), ("u", 45), ("u", 46), ("u", 47), ("u", 48)]
        out = {
            r["bucket_start"]: r
            for r in rate_anomaly(
                spark.createDataFrame(rows, "k string, ts long"),
                ["k"], "ts", 10, trailing=3, factor_x1000=2000, min_count=4,
            ).collect()
        }
        # bucket 4: n=4, trailing {0,0,0} -> infinite ratio: NULL but flagged
        assert out[40]["trailing_sum"] == 0
        assert out[40]["ratio_x1000"] is None
        assert out[40]["is_anomaly"]

    def test_min_count_suppresses_noise(self, spark):
        from flatbread_spark.operators.timeseries import rate_anomaly

        rows = [("u", 0), ("u", 45)]  # 1-vs-0 burst below min_count
        out = {
            r["bucket_start"]: r
            for r in rate_anomaly(
                spark.createDataFrame(rows, "k string, ts long"),
                ["k"], "ts", 10, trailing=3, factor_x1000=2000, min_count=4,
            ).collect()
        }
        assert not out[40]["is_anomaly"]


# ----------------------------------------------------------------- label_vote
class TestLabelVote:
    def test_majority_and_agreement(self, spark):
        from flatbread_spark.operators.curation import label_vote

        rows = (
            [(1, "en")] * 3 + [(1, "de")] * 1
            + [(2, "fr")] * 2 + [(2, "en")] * 2      # tie -> 'en' (lex)
            + [(3, "nl")] * 1
            + [(4, None)] * 2 + [(4, "en")] * 1      # nulls are abstentions
        )
        df = spark.createDataFrame(rows, "item bigint, lab string")
        out = {r["item"]: r for r in label_vote(df, "item", "lab").collect()}
        assert out[1]["label"] == "en" and out[1]["n_winner"] == 3
        assert out[1]["n_votes"] == 4 and out[1]["agreement_ppm"] == 750000
        assert out[1]["n_labels"] == 2
        assert out[2]["label"] == "en" and out[2]["agreement_ppm"] == 500000
        assert out[3]["agreement_ppm"] == 1000000 and out[3]["n_labels"] == 1
        assert out[4]["n_votes"] == 1 and out[4]["label"] == "en"

    def test_weighted_votes(self, spark):
        from flatbread_spark.operators.curation import label_vote

        df = spark.createDataFrame(
            [(1, "a", 1), (1, "a", 1), (1, "b", 5)],
            "item bigint, lab string, w bigint",
        )
        out = label_vote(df, "item", "lab", weight_col="w").collect()[0]
        assert out["label"] == "b" and out["n_winner"] == 5
        assert out["n_votes"] == 7
        assert out["agreement_ppm"] == (5 * 1_000_000) // 7

    def test_deterministic_under_repartition(self, spark):
        from flatbread_spark.operators.curation import label_vote

        rows = [(i % 7, f"l{(i * 13) % 5}") for i in range(200)]
        df = spark.createDataFrame(rows, "item bigint, lab string")
        a = sorted(map(tuple, label_vote(df, "item", "lab").collect()))
        b = sorted(
            map(tuple, label_vote(df.repartition(11), "item", "lab").collect())
        )
        assert a == b
