"""Round-11 operators: curriculum training order, cross-source duplication
matrix. Checked against independent pure-Python re-derivations plus the
documented determinism guarantees."""
import hashlib

from pyspark.sql import functions as F


# ----------------------------------------------------------- curriculum_order
class TestCurriculumOrder:
    def _df(self, spark):
        rows = [(i, 1000 - i * 37 % 900) for i in range(60)]
        return spark.createDataFrame(rows, "doc_id bigint, q bigint")

    def _tier(self):
        return (
            F.when(F.col("q") >= 700, 0).when(F.col("q") >= 300, 1).otherwise(2)
        )

    def test_matches_reference_order(self, spark):
        from flatbread_spark.operators.ranking import curriculum_order

        df = self._df(spark)
        got = {
            r["doc_id"]: (r["tier"], r["train_pos"])
            for r in curriculum_order(df, "doc_id", self._tier(), salt=":s").collect()
        }

        def tier(q):
            return 0 if q >= 700 else (1 if q >= 300 else 2)

        rows = [(i, 1000 - i * 37 % 900) for i in range(60)]
        expect = sorted(
            rows,
            key=lambda r: (
                tier(r[1]),
                hashlib.md5(f"{r[0]}:s".encode()).hexdigest(),
                r[0],
            ),
        )
        for pos, (doc_id, q) in enumerate(expect, start=1):
            assert got[doc_id] == (tier(q), pos)

    def test_positions_dense_and_tiers_contiguous(self, spark):
        from flatbread_spark.operators.ranking import curriculum_order

        out = curriculum_order(
            self._df(spark), "doc_id", self._tier()
        ).orderBy("train_pos").collect()
        assert [r["train_pos"] for r in out] == list(range(1, 61))
        tiers = [r["tier"] for r in out]
        assert tiers == sorted(tiers)  # tier 0 block first, then 1, then 2

    def test_salt_rerolls_within_tier_only(self, spark):
        from flatbread_spark.operators.ranking import curriculum_order

        df = self._df(spark)
        a = curriculum_order(df, "doc_id", self._tier(), salt="a").collect()
        b = curriculum_order(df, "doc_id", self._tier(), salt="b").collect()
        ta = {r["doc_id"]: r["tier"] for r in a}
        tb = {r["doc_id"]: r["tier"] for r in b}
        assert ta == tb  # tiers stable
        pa = {r["doc_id"]: r["train_pos"] for r in a}
        pb = {r["doc_id"]: r["train_pos"] for r in b}
        assert pa != pb  # order re-rolled


# ---------------------------------------------------------- dup_source_matrix
class TestDupSourceMatrix:
    def test_pair_counts(self, spark):
        from flatbread_spark.operators.dedup import dup_source_matrix

        rows = [
            # content X: 2 in s1, 1 in s2 -> diag s1=1 pair, (s1,s2)=2 pairs
            (1, "s1", "X"), (2, "s1", "X"), (3, "s2", "X"),
            # content Y: 3 in s2 -> diag s2 = 3 pairs
            (4, "s2", "Y"), (5, "s2", "Y"), (6, "s2", "Y"),
            # content Z unique -> contributes nothing
            (7, "s1", "Z"),
        ]
        df = spark.createDataFrame(rows, "id bigint, src string, c string")
        got = {
            (r["src_a"], r["src_b"]): (r["n_fingerprints"], r["n_pairs"])
            for r in dup_source_matrix(df, "id", "c", "src").collect()
        }
        assert got == {
            ("s1", "s1"): (1, 1),
            ("s1", "s2"): (1, 2),
            ("s2", "s2"): (1, 3),
        }

    def test_total_pairs_identity(self, spark):
        """Σ over the matrix equals Σ over fingerprints of C(n,2) — the
        matrix is a partition of all duplicate pairs."""
        from flatbread_spark.operators.dedup import dup_source_matrix

        rows = [
            (i, f"s{i % 3}", f"c{(i * 7) % 11}") for i in range(120)
        ]
        df = spark.createDataFrame(rows, "id bigint, src string, c string")
        matrix_total = (
            dup_source_matrix(df, "id", "c", "src")
            .agg(F.sum("n_pairs"))
            .first()[0]
        )
        per_fp = (
            df.groupBy("c").count().filter("count >= 2")
            .select(F.expr("(count * (count - 1)) div 2").alias("p"))
            .agg(F.sum("p")).first()[0]
        )
        assert matrix_total == per_fp
