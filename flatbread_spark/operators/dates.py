"""Date helpers.

Parity: ``flatbread/tooling.py:76-94`` — align multi-year series by shifting
each year-group's dates to the latest year (for year-over-year overlay charts).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def offset_date_field(df: DataFrame, date_field: str, year_field: str) -> DataFrame:
    """Add ``<date_field>_offs``: the date shifted by (max_year − year) years.

    A year-month interval add preserves the time component (pandas
    ``DateOffset(years=Δ)`` semantics, Feb-29 clamped). The global max is a
    1-row broadcast join, not a driver collect.
    """
    mx = df.agg(F.max(F.col(year_field)).alias("__maxy__"))
    out = (
        df.crossJoin(F.broadcast(mx))
        .withColumn(
            f"{date_field}_offs",
            F.expr(
                f"`{date_field}` + make_ym_interval(__maxy__ - `{year_field}`, 0)"
            ),
        )
        .drop("__maxy__")
    )
    return out
