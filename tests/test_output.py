"""Output layer: table spec, JSON serialization, display config, formats,
Excel format/border computation. Reference spec shape:
``flatbread/output/html/tablespec.py:22-37``."""
import json

import pandas as pd

from flatbread_spark import FlatFrame, pivot_table
from flatbread_spark.output.display import Display, DisplayConfig, render_html
from flatbread_spark.output.excel import (
    get_auto_border_specs,
    get_auto_number_formats,
)
from flatbread_spark.output.tablespec import TableSpecBuilder, _pattern_match


def make_ff(spark):
    pdf = pd.DataFrame(
        {"A": [1, 2, 3], "B": [4.0, 5.0, None]},
        index=pd.Index(["x", "y", "z"], name="k"),
    )
    return FlatFrame.from_pandas(spark, pdf)


def test_spec_shape_and_values(spark):
    ff = make_ff(spark)
    spec = TableSpecBuilder(ff).build_spec()
    assert set(spec) == {"values", "columns", "index"}
    assert spec["values"] == [[1, 4.0], [2, 5.0], [3, None]]
    assert spec["columns"]["values"] == ["A", "B"]
    assert spec["columns"]["dtypes"] == ["int", "float"]
    assert spec["index"]["values"] == ["x", "y", "z"]
    assert spec["index"]["names"] == ["k"]


def test_spec_json_nan_to_null(spark):
    ff = make_ff(spark)
    js = TableSpecBuilder(ff).get_spec_as_json()
    parsed = json.loads(js)
    assert parsed["values"][2] == [3, None]


def test_spec_truncation_head_tail(spark):
    pdf = pd.DataFrame({"v": range(100)}, index=pd.Index(range(100), name="i"))
    ff = FlatFrame.from_pandas(spark, pdf)
    b = TableSpecBuilder(ff, max_rows=10, trim_size=3)
    spec = b.build_spec()
    assert b.truncated
    vals = [row[0] for row in spec["values"]]
    assert vals[:3] == [0, 1, 2] and vals[-3:] == [97, 98, 99]


def test_smart_format_pct_detection(spark):
    li = spark.createDataFrame(
        [("a", 1.0), ("b", 3.0)], ["k", "v"]
    )
    ff = pivot_table(li, index="k", values="v", aggfunc="sum").add_totals(
        axis=0
    ).add_percentages(axis=0)
    spec = TableSpecBuilder(ff).build_spec()
    fmts = dict(zip(spec["columns"]["values"], spec["columns"]["formatOptions"]))
    pct_keys = [k for k in fmts if "pct" in str(k)]
    assert pct_keys and all(fmts[k]["style"] == "percent" for k in pct_keys)
    n_keys = [k for k in fmts if "pct" not in str(k)]
    assert all(fmts[k] is None for k in n_keys)


def test_set_format_preset_and_validation(spark):
    ff = make_ff(spark)
    b = TableSpecBuilder(ff)
    b.set_format("A", "currency_eur")
    assert b.build_spec()["columns"]["formatOptions"][0]["style"] == "currency"
    try:
        b.set_format("A", "no_such_preset")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "Unknown format" in str(e)


def test_set_formats_pattern_matching():
    assert _pattern_match(("n", "F"), "n")
    assert _pattern_match(("pct", "F"), ("pct",))
    assert _pattern_match("pct_F", "pct")
    assert not _pattern_match(("n", "F"), "pct")


def test_display_config_margin_labels(spark):
    ff = make_ff(spark).add_totals(axis=0)
    cfg = DisplayConfig.from_flatframe(ff)
    assert "Totals" in cfg.margin_labels and "Subtotals" in cfg.margin_labels
    html = render_html(Display(ff).get_json(), cfg)
    assert "flatbread-table" in html and "margin-labels" in html
    assert '"values":' in html


def test_display_fluent_and_repr(spark):
    ff = make_ff(spark)
    d = Display(ff).set_max_rows(2).set_trim_size(1).set_na_rep("∅")
    html = d._repr_html_()
    assert 'na-rep", "\\u2205"' in html or "∅" in html
    # ff-level hooks
    assert isinstance(ff.data_spec(), dict)
    assert "<script" in ff._repr_html_()


def test_excel_number_formats_and_borders(spark):
    li = spark.createDataFrame([("a", 1.0), ("b", 3.0)], ["k", "v"])
    ff = (
        pivot_table(li, index="k", values="v", aggfunc="sum")
        .add_totals(axis=0)
        .add_percentages(axis=0)
    )
    fmts = get_auto_number_formats(ff)
    assert any("%" in f for f in fmts.values())
    rows = ff.df.collect()
    borders = get_auto_border_specs(ff, rows)
    assert "Totals" in borders["rows"]
    assert "pct" in borders["columns"]


def test_get_format_presets(spark):
    from flatbread_spark.output.display import Display

    d = Display(make_ff(spark))
    presets = d.get_format_presets()
    assert "percentage" in presets and "currency_eur" in presets
    assert d.get_format_presets(dtype="float")["currency_eur"]["style"] == "currency"


def test_value_counts_null_category(spark):
    from pyspark.sql import functions as F

    from flatbread_spark import value_counts

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], ["k"]
    )
    out = {r.k: r["count"] for r in value_counts(df, "k").to_df().collect()}
    assert out["<NA>"] == 1 and out["a"] == 2 and out["Totals"] == 4


def test_display_border_and_layout_setters(spark):
    """Reference-accessor parity for the border/layout fluent surface
    (reference ``display.py:170-307``): every setter lands as the same
    viewer attribute the Jinja template emits."""
    ff = make_ff(spark)
    d = (
        Display(ff)
        .collapse_columns()
        .set_section_levels(1)
        .set_no_wrap()
        .set_column_border_levels(2)
        .set_separator("…")
        .show_hover()
        .show_row_borders(False)
        .show_header_border(False)
    )
    html = d._repr_html_()
    for attr in (
        '"collapse-columns", "true"',
        '"section-levels", "1"',
        '"no-wrap", ""',
        '"column-border-levels", "2"',
        '"hide-row-borders", ""',
        '"hide-thead-border", ""',
        '"show-hover", ""',
    ):
        assert attr in html, attr
    # hide_borders flips all four groups; aliases mirror the reference names
    d2 = Display(ff).hide_borders()
    html2 = d2._repr_html_()
    for attr in (
        "hide-group-borders", "hide-row-borders",
        "hide-thead-border", "hide-index-border",
    ):
        assert f'"{attr}", ""' in html2, attr
    assert d2.get_table_spec() == d2.data_spec()
    assert d2.get_table_spec_json() == d2.get_json()
    assert d2.configure_display(max_rows=7).config.max_rows == 7
