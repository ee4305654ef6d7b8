"""validate_constraints: one-scan declarative data-quality report."""
import pytest
from pyspark.sql import functions as F

from flatbread_spark.operators.validate import (
    accepted_values,
    in_range,
    matches_regex,
    not_null,
    satisfies,
    unique,
    validate_constraints,
)


@pytest.fixture()
def frame(spark):
    rows = [
        (1, "en", 10, "alpha"),
        (2, "en", 500, "beta"),
        (2, "de", -3, "gamma!"),   # dup id, out-of-range
        (3, None, 20, "delta"),    # null lang
        (None, "xx", 30, None),    # null id, bad lang, null text
        (None, "en", 9999, "eps"), # second null id (dup with prev under NULL==NULL)
    ]
    return spark.createDataFrame(rows, "id bigint, lang string, n bigint, text string")


def _report(df, rules):
    return {
        r["rule"]: (r["kind"], r["n_violations"], r["passed"])
        for r in validate_constraints(df, rules).collect()
    }


class TestValidate:
    def test_all_kinds(self, frame):
        got = _report(
            frame,
            [
                not_null("id"),
                not_null("lang"),
                unique("id"),
                accepted_values("lang", ["en", "de", "fr"]),
                in_range("n", 0, 1000),
                matches_regex("text", r"^[a-z]+$"),
                satisfies("n_even", F.col("n") % 2 == 0),
            ],
        )
        assert got["not_null(id)"] == ("not_null", 2, False)
        assert got["not_null(lang)"] == ("not_null", 1, False)
        # 6 rows, distinct ids {1, 2, 3, NULL} -> 2 duplicate rows
        assert got["unique(id)"] == ("unique", 2, False)
        # nulls are not accepted_values' problem; only 'xx' violates
        assert got["accepted_values(lang)"] == ("accepted_values", 1, False)
        assert got["in_range(n)"] == ("in_range", 2, False)
        # 'gamma!' fails; NULL text is not counted
        assert got["matches_regex(text)"] == ("matches_regex", 1, False)
        # odd n rows violate; NULL predicate would count as violation
        assert got["n_even"] == ("satisfies", 2, False)

    def test_passing_report_and_order(self, frame):
        rules = [in_range("n", -10, 10_000), not_null("n"), unique("id", "lang")]
        rep = validate_constraints(frame, rules).collect()
        assert [r["rule"] for r in rep] == [
            "in_range(n)", "not_null(n)", "unique(id, lang)",
        ]
        assert all(r["passed"] for r in rep)

    def test_multi_col_unique_null_tuple(self, spark):
        df = spark.createDataFrame(
            [(1, None), (1, None), (1, 2)], "a bigint, b bigint"
        )
        got = _report(df, [unique("a", "b")])
        assert got["unique(a, b)"][1] == 1

    def test_duplicate_rule_names_raise(self, frame):
        with pytest.raises(ValueError, match="duplicate"):
            validate_constraints(frame, [not_null("id"), not_null("id")])

    def test_single_scan_for_row_local_rules(self, frame):
        rep = validate_constraints(
            frame, [not_null("id"), in_range("n", 0, 10), not_null("text")]
        )
        plan = rep._jdf.queryExecution().executedPlan().toString()
        # exactly TWO ExistingRDD scans: the data (once, shared by all
        # three conditional counts) and the bounded rule-dimension table
        assert plan.count("Scan ExistingRDD") == 2

    def test_unique_only(self, frame):
        got = _report(frame, [unique("id")])
        assert got["unique(id)"][1] == 2


def test_merge_upsert_accepts_reordered_delta_columns(spark):
    """The merge unions by NAME; a delta with the same columns in a
    different order is valid input (previously rejected by an
    order-sensitive schema check)."""
    from flatbread_spark.operators.versioning import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 1)], "k int, payload string, v int"
    )
    delta = spark.createDataFrame(
        [(2, 2, "b")], "v int, k int, payload string"
    )
    out = merge_upsert(base, delta, keys=["k"], version_col="v").orderBy("k")
    assert [(r.k, r.payload, r.v) for r in out.collect()] == [
        (1, "a", 1), (2, "b", 2),
    ]
