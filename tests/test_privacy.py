"""k-anonymity / l-diversity audit vs a pure-Python oracle."""
import pytest


class TestKAnonymity:
    @staticmethod
    def _oracle(rows, k):
        from collections import Counter, defaultdict

        classes = Counter((r[0], r[1]) for r in rows)
        sens = defaultdict(set)
        for r in rows:
            sens[(r[0], r[1])].add(r[2])
        sizes = list(classes.values())
        return (
            len(rows), len(sizes), min(sizes), max(sizes),
            sum(1 for s in sizes if s < k),
            sum(s for s in sizes if s < k),
            sum(1 for c in classes if len(sens[c]) == 1),
        )

    def test_matches_python(self, spark):
        from flatbread_spark.operators.privacy import k_anonymity

        rows = [
            ("en", "src1", "a"), ("en", "src1", "b"), ("en", "src1", "a"),
            ("en", "src2", "a"),                       # singleton, homogeneous
            ("de", "src1", "x"), ("de", "src1", "x"),  # size 2, homogeneous
            ("fr", "src3", "p"), ("fr", "src3", "q"), ("fr", "src3", "r"),
        ]
        df = spark.createDataFrame(rows, "lang string, src string, s string")
        r = k_anonymity(df, ["lang", "src"], k=3, sensitive_col="s").collect()[0]
        got = (r["n_rows"], r["n_classes"], r["min_class"], r["max_class"],
               r["n_below_k_classes"], r["n_rows_below_k"], r["n_homogeneous"])
        assert got == self._oracle(rows, 3)

    def test_without_sensitive(self, spark):
        from flatbread_spark.operators.privacy import k_anonymity

        df = spark.createDataFrame(
            [("a", 1), ("a", 1), ("b", 1)], "q string, v bigint"
        )
        r = k_anonymity(df, ["q"], k=2).collect()[0]
        assert r["min_class"] == 1 and r["n_rows_below_k"] == 1
        assert "n_homogeneous" not in r.asDict()

    def test_validation(self, spark):
        from flatbread_spark.operators.privacy import k_anonymity

        df = spark.createDataFrame([("a",)], "q string")
        with pytest.raises(ValueError):
            k_anonymity(df, [], k=2)
        with pytest.raises(ValueError):
            k_anonymity(df, ["q"], k=0)
