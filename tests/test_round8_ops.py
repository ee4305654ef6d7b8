"""Round-8 operators: snapshot merge/diff (corpus versioning), time-series
gap fill, blocked fuzzy entity resolution.

Same discipline as test_round6/7_ops: every operator is checked against an
independent pure-Python re-implementation of its contract, plus the
determinism / bound guards its module docstring promises.
"""
import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------- merge_upsert
class TestMergeUpsert:
    def _frames(self, spark):
        base = spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1), (3, "c", 1), (4, "d", 1)],
            "k bigint, v string, version bigint",
        )
        delta = spark.createDataFrame(
            [(2, "B", 2, False), (3, "c2", 2, True), (5, "e", 2, False)],
            "k bigint, v string, version bigint, deleted boolean",
        )
        return base, delta

    def test_latest_wins_and_tombstones(self, spark):
        from flatbread_spark.operators.versioning import merge_upsert

        base, delta = self._frames(spark)
        got = {
            (r["k"], r["v"], r["version"])
            for r in merge_upsert(base, delta, ["k"], "version", "deleted").collect()
        }
        # 1 kept, 2 updated, 3 deleted, 4 kept, 5 inserted
        assert got == {(1, "a", 1), (2, "B", 2), (4, "d", 1), (5, "e", 2)}

    def test_version_tie_delta_wins(self, spark):
        from flatbread_spark.operators.versioning import merge_upsert

        base = spark.createDataFrame([(1, "old", 7)], "k bigint, v string, version bigint")
        delta = spark.createDataFrame([(1, "new", 7)], "k bigint, v string, version bigint")
        [r] = merge_upsert(base, delta, ["k"], "version").collect()
        assert r["v"] == "new"

    def test_schema_mismatch_raises(self, spark):
        from flatbread_spark.operators.versioning import merge_upsert

        base = spark.createDataFrame([(1, "a")], "k bigint, v string")
        delta = spark.createDataFrame([(1, 2)], "k bigint, w bigint")
        with pytest.raises(ValueError, match="schemas differ"):
            merge_upsert(base, delta, ["k"], "v")


# ------------------------------------------------------------- snapshot_diff
class TestSnapshotDiff:
    def test_statuses(self, spark):
        from flatbread_spark.operators.versioning import (
            snapshot_diff,
            snapshot_diff_summary,
        )

        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
            "k bigint, v string, x double",
        )
        new = spark.createDataFrame(
            [(2, "b", 20.0), (3, "C", 30.0), (4, "", 40.0), (5, "e", 50.0)],
            "k bigint, v string, x double",
        )
        got = {(r["k"], r["status"]) for r in snapshot_diff(old, new, ["k"]).collect()}
        # NULL vs '' must read as changed (typed hash distinguishes them)
        assert got == {
            (1, "deleted"),
            (2, "unchanged"),
            (3, "changed"),
            (4, "changed"),
            (5, "added"),
        }
        summary = {
            (r["status"], r["n_keys"])
            for r in snapshot_diff_summary(old, new, ["k"]).collect()
        }
        assert summary == {
            ("added", 1),
            ("deleted", 1),
            ("changed", 2),
            ("unchanged", 1),
        }

    def test_compare_cols_subset(self, spark):
        from flatbread_spark.operators.versioning import snapshot_diff

        old = spark.createDataFrame([(1, "a", 1.0)], "k bigint, v string, x double")
        new = spark.createDataFrame([(1, "a", 9.9)], "k bigint, v string, x double")
        [r] = snapshot_diff(old, new, ["k"], ["v"]).collect()
        assert r["status"] == "unchanged"

    def test_summary_always_four_rows(self, spark):
        from flatbread_spark.operators.versioning import snapshot_diff_summary

        df = spark.createDataFrame([(1, "a")], "k bigint, v string")
        rows = snapshot_diff_summary(df, df, ["k"]).collect()
        assert {r["status"] for r in rows} == {"added", "deleted", "changed", "unchanged"}
        assert sum(r["n_keys"] for r in rows) == 1


# ------------------------------------------------------------------ gap_fill
class TestGapFill:
    def test_matches_pure_python(self, spark):
        from flatbread_spark.operators.timeseries import gap_fill

        rows = [
            ("u1", 3, 1.0),
            ("u1", 17, 2.0),
            ("u1", 44, 3.0),
            ("u2", 100, 5.0),
            ("u2", 121, 6.0),
        ]
        df = spark.createDataFrame(rows, "key string, ts bigint, value double")
        out = gap_fill(
            df,
            ["key"],
            "ts",
            10,
            {"n": F.count(F.lit(1)), "v": F.sum("value")},
            fill=["v"],
        ).collect()
        got = {(r["key"], r["bucket_start"], r["n"], r["v"]) for r in out}

        # pure-python spine: floor to 10s, span inclusive, forward-fill v
        def py(rows):
            from collections import defaultdict

            per = defaultdict(list)
            for k, ts, v in rows:
                per[k].append((ts // 10 * 10, v))
            res = set()
            for k, obs in per.items():
                buckets = defaultdict(list)
                for b, v in obs:
                    buckets[b].append(v)
                lo, hi = min(buckets), max(buckets)
                last = None
                for b in range(lo, hi + 1, 10):
                    if b in buckets:
                        last = sum(buckets[b])
                        res.add((k, b, len(buckets[b]), last))
                    else:
                        res.add((k, b, None, last))
            return res

        assert got == py(rows)

    def test_unfilled_stays_null(self, spark):
        from flatbread_spark.operators.timeseries import gap_fill

        df = spark.createDataFrame(
            [("a", 0, 1.0), ("a", 25, 2.0)], "key string, ts bigint, value double"
        )
        out = {
            r["bucket_start"]: (r["n"], r["v"])
            for r in gap_fill(
                df, ["key"], "ts", 10, {"n": F.count(F.lit(1)), "v": F.sum("value")}
            ).collect()
        }
        assert out[10] == (None, None)

    def test_span_guard_raises(self, spark):
        from flatbread_spark.operators.timeseries import gap_fill

        df = spark.createDataFrame(
            [("a", 0, 1.0), ("a", 10_000, 2.0)], "key string, ts bigint, value double"
        )
        with pytest.raises(Exception, match="max_buckets_per_key"):
            gap_fill(
                df,
                ["key"],
                "ts",
                1,
                {"n": F.count(F.lit(1))},
                max_buckets_per_key=100,
            ).collect()

    def test_bad_step_raises(self, spark):
        from flatbread_spark.operators.timeseries import gap_fill

        df = spark.createDataFrame([("a", 0, 1.0)], "key string, ts bigint, value double")
        with pytest.raises(ValueError, match="step"):
            gap_fill(df, ["key"], "ts", 0, {"n": F.count(F.lit(1))})


# --------------------------------------------------------- fuzzy_match_pairs
def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestFuzzyMatch:
    NAMES = [
        "red widget",
        "red widgett",
        "red widget",
        "red wodget",
        "blue bolt",
        "blue boltt",
        "green gear",
    ]

    def _df(self, spark):
        return spark.createDataFrame([(n,) for n in self.NAMES], "name string")

    def test_matches_pure_python(self, spark):
        from flatbread_spark.operators.linkage import fuzzy_match_pairs

        got = {
            (r["name_a"], r["name_b"], r["dist"], r["n_a"], r["n_b"])
            for r in fuzzy_match_pairs(self._df(spark), "name", 2).collect()
        }
        from collections import Counter

        counts = Counter(self.NAMES)
        vocab = sorted(counts)
        want = set()
        for i, x in enumerate(vocab):
            for y in vocab[i + 1 :]:
                if x.split()[0] != y.split()[0]:
                    continue
                d = _lev(x, y)
                if 1 <= d <= 2:
                    want.add((x, y, d, counts[x], counts[y]))
        assert got == want
        assert ("red widget", "red widgett", 1, 2, 1) in got

    def test_cross_block_never_pairs(self, spark):
        from flatbread_spark.operators.linkage import fuzzy_match_pairs

        df = spark.createDataFrame([("aa x",), ("ab x",)], "name string")
        assert fuzzy_match_pairs(df, "name", 5).count() == 0

    def test_block_guard_raises(self, spark):
        from flatbread_spark.operators.linkage import fuzzy_match_pairs

        df = spark.createDataFrame([(f"same {i}",) for i in range(50)], "name string")
        with pytest.raises(Exception, match="max_block"):
            fuzzy_match_pairs(df, "name", 1, max_block=10).collect()

    def test_canonicalize(self, spark):
        from flatbread_spark.operators.linkage import canonicalize_names

        got = {
            r["name"]: r["canonical"]
            for r in canonicalize_names(self._df(spark), "name", 2).collect()
        }
        # 'red widget' (n=2) is the canonical target for its 1-edit variants
        assert got["red widgett"] == "red widget"
        assert got["red widget"] == "red widget"
        # no neighbor with a strictly higher count -> identity
        assert got["green gear"] == "green gear"
        # n=1 tie ('blue bolt' vs 'blue boltt') -> identity (no strict winner)
        assert got["blue bolt"] == "blue bolt"
        assert got["blue boltt"] == "blue boltt"
