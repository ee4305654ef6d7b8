"""Pivot construction tests (``flatbread_spark/sources/pivot.py``)."""
import pandas as pd

from flatbread_spark import pivot_table


def _src(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b"],
            "s": ["F", "O", "F", "O"],
            "unit_qty": [1.0, 2.0, 3.0, 4.0],
            "net_amt": [10.0, 20.0, 30.0, 40.0],
        }
    )
    return spark.createDataFrame(pdf)


def test_multi_value_pivot_labels_with_underscores(spark):
    """Round-1 regression: rpartition('_') split Spark's '<pivval>_<value>'
    column names at the wrong underscore when the value name contains one,
    corrupting the column MultiIndex."""
    ff = pivot_table(
        _src(spark), index="k", columns="s",
        values=["unit_qty", "net_amt"], aggfunc="sum",
    )
    labels = [c.labels for c in ff.cols]
    assert labels == [
        ("F", "net_amt"), ("F", "unit_qty"), ("O", "net_amt"), ("O", "unit_qty"),
    ], labels
    out = ff.to_pandas()
    assert out[("F", "unit_qty")].tolist() == [1.0, 3.0]
    assert out[("O", "net_amt")].tolist() == [20.0, 40.0]


def test_multi_value_pivot_suffix_ambiguity(spark):
    """Longest-suffix match: values=['qty', 'unit_qty'] must not cross-assign."""
    df = _src(spark).withColumnRenamed("net_amt", "qty")
    ff = pivot_table(
        df, index="k", columns="s", values=["qty", "unit_qty"], aggfunc="sum"
    )
    labels = sorted(c.labels for c in ff.cols)
    assert labels == [
        ("F", "qty"), ("F", "unit_qty"), ("O", "qty"), ("O", "unit_qty"),
    ], labels
    out = ff.to_pandas()
    assert out[("F", "unit_qty")].tolist() == [1.0, 3.0]
    assert out[("F", "qty")].tolist() == [10.0, 30.0]
