"""add_differences: pandas .diff oracle, margin exclusion, label tracking.
The reference reserves this transform in config (config.defaults.json:22-27)
without implementing it; semantics here follow pandas DataFrame.diff."""
import pandas as pd

from flatbread_spark import FlatFrame


def base_pdf():
    return pd.DataFrame(
        {"q1": [10, 20, 30], "q2": [12, 18, 33], "q3": [15, 21, 30]},
        index=pd.Index(["a", "b", "c"], name="k"),
    )


def test_diff_axis1_matches_pandas(spark):
    pdf = base_pdf()
    ff = FlatFrame.from_pandas(spark, pdf).add_differences(axis=1)
    got = ff.to_pandas()
    expected = pdf.diff(axis=1)
    for c in pdf.columns:
        n = got[("n", c)].tolist()
        d = got[("diff", c)].tolist()
        assert n == pdf[c].tolist()
        exp = expected[c].tolist()
        assert all(
            (pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(d, exp)
        ), (c, d, exp)


def test_diff_axis0_matches_pandas(spark):
    pdf = base_pdf()
    ff = FlatFrame.from_pandas(spark, pdf).add_differences(axis=0)
    got = ff.to_pandas()
    expected = pdf.diff(axis=0)
    for c in pdf.columns:
        d = got[("diff", c)].tolist()
        exp = expected[c].tolist()
        assert all(
            (pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(d, exp)
        ), (c, d, exp)


def test_diff_axis0_skips_margin_rows(spark):
    ff = FlatFrame.from_pandas(spark, base_pdf()).add_totals(axis=0)
    out = ff.add_differences(axis=0).to_pandas()
    # margin row has null diffs; row after a margin diffs against the
    # previous DATA row (none here since Totals is last)
    assert out.loc["Totals", ("diff", "q1")] != out.loc["Totals", ("diff", "q1")] or \
        pd.isna(out.loc["Totals", ("diff", "q1")])
    assert out.loc["c", ("diff", "q1")] == 10.0


def test_totals_after_diff_ignore_diff_columns(spark):
    ff = FlatFrame.from_pandas(spark, base_pdf()).add_differences(axis=1)
    assert "diff" in ff.tracked("differences")
    out = ff.add_totals(axis=1).to_pandas()
    # row totals sum only the n block: a=10+12+15
    assert out.loc["a", ("Totals", "")] == 37 or out[("Totals", "")].loc["a"] == 37
