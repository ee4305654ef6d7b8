"""Null-inclusive value counts with totals and optional percentages.

Parity: ``flatbread/accessors/series.py:109-151`` — unlike ``pandas
value_counts``, nulls count as a real ``'<NA>'`` category by default, a Totals
row is appended, and a pct column can be added (computed against the Totals
row, apportioned-rounded so it sums to base).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flatbread_spark.frame import ColInfo, FlatFrame
from flatbread_spark.operators.percentages import add_percentages
from flatbread_spark.operators.totals import add_totals


def value_counts(
    df: DataFrame,
    column: str,
    fillna: str | None = "<NA>",
    label_n: str = "count",
    add_pct: bool = False,
    label_pct: str = "pct",
    ndigits: int = -1,
    base: int = 1,
    totals_label: str = "Totals",
    apportioned_rounding: bool = True,
) -> FlatFrame:
    sel = F.col(column).cast("string")
    if fillna is not None:
        sel = F.coalesce(sel, F.lit(fillna))
    else:
        df = df.filter(F.col(column).isNotNull())
    counts = (
        df.select(sel.alias(column))
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias(label_n))
    )
    # pandas value_counts order: count desc; ties broken by value for determinism
    ff = FlatFrame.from_df(
        counts, index=[column], order_by=[F.desc(label_n), F.col(column)]
    )
    ff = add_totals(ff, axis=0, label=totals_label)
    if add_pct:
        ff = add_percentages(
            ff,
            axis=0,
            label_n=label_n,
            label_pct=label_pct,
            label_totals=totals_label,
            ndigits=ndigits,
            base=base,
            apportioned_rounding=apportioned_rounding,
        )
        # reference Series output keeps single-level columns [count, pct]
        ff = ff._copy(
            cols=[ColInfo((label_n,), ff.cols[0].name), ColInfo((label_pct,), ff.cols[1].name)],
            col_names=[None],
        )
    return ff
