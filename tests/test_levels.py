"""Tests for sort_aggregates/sort_totals, add_level, sort_index_from_list,
offset_date_field (SURVEY §2 #10, #11, #14, #15)."""
import numpy as np
import pandas as pd

from flatbread_spark import FlatFrame
from flatbread_spark.operators.dates import offset_date_field
from flatbread_spark.operators.levels import (
    add_level,
    sort_aggregates,
    sort_index_from_list,
    sort_totals,
)
from flatbread_spark.operators.totals import add_totals


def frame(spark, index, name="K"):
    pdf = pd.DataFrame(
        {"A": range(1, len(index) + 1)}, index=pd.Index(index, name=name)
    )
    return FlatFrame.from_pandas(spark, pdf)


def test_sort_totals_last(spark):
    ff = frame(spark, ["Item1", "Totals", "Item2"])
    out = sort_totals(ff).to_pandas()
    assert list(out.index) == ["Item1", "Item2", "Totals"]


def test_sort_totals_first(spark):
    ff = frame(spark, ["Item1", "Totals", "Item2"])
    out = sort_totals(ff, totals_last=False).to_pandas()
    assert list(out.index) == ["Totals", "Item1", "Item2"]


def test_sort_aggregates_preserves_other_order(spark):
    ff = frame(spark, ["z", "Totals", "m", "a"])
    out = sort_aggregates(ff, labels=["Totals"], sort_remaining=False).to_pandas()
    assert list(out.index) == ["z", "m", "a", "Totals"]


def test_sort_index_from_list(spark):
    ff = frame(spark, ["b", "c", "a"])
    out = sort_index_from_list(ff, ["c", "a", "b"]).to_pandas()
    assert list(out.index) == ["c", "a", "b"]


def test_add_level_rows(spark):
    ff = frame(spark, ["x", "y"])
    out = add_level(ff, "G", level=0, level_name="GRP", axis=0)
    pdf = out.to_pandas()
    assert pdf.index.nlevels == 2
    assert list(pdf.index) == [("G", "x"), ("G", "y")]


def test_add_level_rows_list_values(spark):
    """Per-row list values on the row axis (reference axes.py:253-258):
    zipped by the frame's current row order, length-validated."""
    import pytest

    ff = frame(spark, ["x", "y", "z"])
    out = add_level(ff, ["g1", "g1", "g2"], level=0, level_name="GRP", axis=0)
    pdf = out.to_pandas()
    assert list(pdf.index) == [("g1", "x"), ("g1", "y"), ("g2", "z")]
    assert pdf.index.names == ["GRP", "K"]
    # inner position keeps values aligned
    out2 = add_level(ff, ["a", "b", "c"], level=1, axis=0)
    pdf2 = out2.to_pandas()
    assert list(pdf2.index) == [("x", "a"), ("y", "b"), ("z", "c")]
    with pytest.raises(ValueError, match="must match"):
        add_level(ff, ["only", "two"], level=0, axis=0)


def test_add_level_columns(spark):
    ff = frame(spark, ["x", "y"])
    out = add_level(ff, "blk", level=0, axis=1)
    assert out.cols[0].labels == ("blk", "A")
    # metadata only: physical plan untouched
    assert out.df is ff.df


def test_column_sort_metadata(spark):
    pdf = pd.DataFrame(
        [[1, 2, 3]], index=pd.Index(["r"], name="K"), columns=["b", "Totals", "a"]
    )
    ff = FlatFrame.from_pandas(spark, pdf)
    out = sort_totals(ff, axis=1)
    assert [c.labels[0] for c in out.cols] == ["b", "a", "Totals"]


def test_offset_date_field(spark):
    pdf = pd.DataFrame(
        {
            "d": pd.to_datetime(["2020-03-15 10:30:00", "2022-07-01 00:00:00"]),
            "y": [2020, 2022],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = offset_date_field(sdf, "d", "y").orderBy("y").toPandas()
    assert out["d_offs"].iloc[0] == pd.Timestamp("2022-03-15 10:30:00")
    assert out["d_offs"].iloc[1] == pd.Timestamp("2022-07-01 00:00:00")


def test_fluent_api(spark, lineitem):
    from flatbread_spark import pivot_table

    ff = pivot_table(
        lineitem,
        index="l_returnflag",
        columns="l_linestatus",
        values="l_quantity",
        aggfunc="sum",
    )
    out = ff.add_totals(axis=2).add_percentages(axis=2, ndigits=1, base=100).to_df()
    rows = out.collect()
    assert len(rows) >= 3
    assert any(r[0] == "Totals" for r in rows)
