"""Numeric binning with pandas-``cut``-style interval labels.

The reference's users bin numerics with ``pd.cut`` and pivot on the
resulting Interval categoricals; its table spec serializes those intervals
as ``str(Interval)`` — ``"(0.0, 50000.0]"``
(``/root/reference/flatbread/output/html/tablespec.py:260-261``). Spark has
no interval-bin column type, so the idiomatic equivalent is a string label
column with the SAME rendering: produced JVM-side by a when-chain (stays in
whole-stage codegen, no UDF), it pivots/serializes exactly like any other
string key.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def interval_label(lo, hi, right: bool = True, as_int: bool = False) -> str:
    """The exact ``str(pd.Interval(lo, hi, closed))`` rendering.

    pandas renders edges through the bins array's dtype: an all-int bins
    list gives ``"(0, 100000]"``, any float edge makes the WHOLE array
    float64 and gives ``"(0.0, 100000.0]"`` — so int-ness is a property of
    the bins list (``as_int``), not of each edge's value.
    """
    lo, hi = (int(lo), int(hi)) if as_int else (float(lo), float(hi))
    return f"({lo}, {hi}]" if right else f"[{lo}, {hi})"


def cut(col: Column, bins: Sequence[float], right: bool = True) -> Column:
    """Bin a numeric column into pandas-``cut``-style labeled intervals.

    Returns a string column; values outside every bin (and nulls) map to
    NULL, matching ``pd.cut``'s NaN. Bins must be monotonically increasing.
    Labels are byte-equal to ``str(pd.cut(...).cat.categories[i])`` for both
    int and float bin edges.
    """
    as_int = all(isinstance(b, int) and not isinstance(b, bool) for b in bins)
    edges = [float(b) for b in bins]
    if len(edges) < 2 or any(b >= c for b, c in zip(edges, edges[1:])):
        raise ValueError(f"bins must be increasing with >= 2 edges, got {bins}")
    c = col.cast("double")
    out = F.lit(None).cast("string")
    for lo, hi in reversed(list(zip(edges, edges[1:]))):
        cond = ((c > lo) & (c <= hi)) if right else ((c >= lo) & (c < hi))
        out = F.when(cond, F.lit(interval_label(lo, hi, right, as_int))).otherwise(out)
    return out
