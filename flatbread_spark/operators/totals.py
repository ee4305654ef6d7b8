"""Totals and subtotals margins.

Parity: ``flatbread/transforms/totals.py`` — thin specializations of
``add_agg``/``add_subagg`` to ``sum``, with label tracking so chained ops
auto-ignore earlier margins (``totals.py:14-32``), axis=2 meaning
"rows then columns" (``totals.py:58-75``), and ``drop_totals`` implementing the
*intended* behavior of ``totals.py:255-262`` (the reference reads a stale attrs
path there — SURVEY §2 #5).

Also provides ``rollup_subtotals``: the scale path that computes subtotals for
*all* level prefixes plus the grand total in ONE shuffle via
``GROUPING SETS``/``rollup`` + ``grouping_id()`` instead of one groupBy per
level — preferred at 100 TB when building a fully-margined table from a long
fact table (SURVEY §2 #2 "preferred at scale").
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flatbread_spark.frame import POS, FlatFrame
from flatbread_spark.operators.aggregation import add_agg, add_subagg

DEFAULT_TOTALS_LABEL = "Totals"
DEFAULT_SUBTOTALS_LABEL = "Subtotals"


def _resolve_ignored_keys(ff: FlatFrame, axis: int, ignore_keys) -> list[str]:
    """User keys + previously tagged margin labels (reference ``totals.py:14-32``):
    totals always ignored; percentage/difference labels only on the column axis
    (they must not be summed into a totals column)."""
    keys: list[str] = []
    if isinstance(ignore_keys, str):
        keys.append(ignore_keys)
    elif isinstance(ignore_keys, (list, tuple)):
        keys.extend(ignore_keys)
    keys.extend(ff.tracked("totals"))
    if axis == 1:
        keys.extend(ff.tracked("percentages"))
        keys.extend(ff.tracked("differences"))
    return keys


def _resolve_axis(axis) -> int:
    match axis:
        case 0 | "index" | "rows" | None:
            return 0
        case 1 | "columns":
            return 1
        case 2 | "both":
            return 2
        case _:
            raise ValueError(f"Invalid axis: {axis}")


def add_totals(
    ff: FlatFrame,
    axis=2,
    label: str | None = None,
    ignore_keys: str | Sequence[str] | None = None,
    _fill: str = "",
) -> FlatFrame:
    """Grand totals row/column/both (reference ``totals.py:36-76``)."""
    axis = _resolve_axis(axis)
    label = DEFAULT_TOTALS_LABEL if label is None else label
    keys = _resolve_ignored_keys(ff, axis, ignore_keys)
    if axis < 2:
        out = add_agg(ff, "sum", axis=axis, label=label, ignore_keys=keys, _fill=_fill)
    else:
        out = add_totals(ff, axis=0, label=label, ignore_keys=keys, _fill=_fill)
        out = add_totals(out, axis=1, label=label, ignore_keys=keys, _fill=_fill)
    return out.tag("totals", label)


def add_subtotals(
    ff: FlatFrame,
    axis=0,
    level=0,
    label: str | None = None,
    include_level_name: bool = False,
    ignore_keys: str | Sequence[str] | None = None,
    skip_single_rows: bool = True,
    _fill: str = "",
) -> FlatFrame:
    """Per-group subtotal rows at level(s) (reference ``totals.py:80-251``).

    Multiple levels apply sequentially; commutes with ``add_totals`` because
    both mask each other's labels (property pinned by reference
    ``tests/transforms/test_totals.py:153-164`` and our tests).
    """
    axis = _resolve_axis(axis)
    label = DEFAULT_SUBTOTALS_LABEL if label is None else label
    keys = _resolve_ignored_keys(ff, axis, ignore_keys)
    if axis == 2:
        out = add_subtotals(
            ff, axis=0, level=level, label=label,
            include_level_name=include_level_name, ignore_keys=keys,
            skip_single_rows=skip_single_rows, _fill=_fill,
        )
        out = add_subtotals(
            out, axis=1, level=level, label=label,
            include_level_name=include_level_name, ignore_keys=keys,
            skip_single_rows=skip_single_rows, _fill=_fill,
        )
        return out.tag("totals", label)
    out = add_subagg(
        ff, "sum", axis=axis, level=level, label=label,
        include_level_name=include_level_name, ignore_keys=keys,
        skip_single_rows=skip_single_rows, _fill=_fill,
    )
    return out.tag("totals", label)


def drop_totals(
    ff: FlatFrame,
    ignore_keys: str | Sequence[str] | None = None,
) -> FlatFrame:
    """Remove margin rows. Intended behavior of reference ``totals.py:255-262``:
    default keys = the tracked totals labels (the reference reads a stale attrs
    path and KeyErrors — we implement what it meant to do)."""
    if ignore_keys is None:
        ignore_keys = ff.tracked("totals")
        if not ignore_keys:
            raise ValueError("no tracked totals labels; pass ignore_keys")
    mask = ff.data_row_mask(ignore_keys)
    labels = {k: v for k, v in ff.labels.items() if k not in ("totals", "__keys__")}
    return ff._copy(df=ff.df.filter(mask), labels=labels)


def rollup_subtotals(
    df: DataFrame,
    index: Sequence[str],
    values: dict[str, str],
    label: str = DEFAULT_SUBTOTALS_LABEL,
    totals_label: str = DEFAULT_TOTALS_LABEL,
    _fill: str = "",
) -> FlatFrame:
    """Single-pass margined table straight from a long fact table.

    ``df.rollup(levels).agg(...)`` computes every level-prefix subtotal AND the
    grand total in one shuffle; ``grouping(col)`` identifies which levels are
    aggregated in each output row so we can rewrite them into flatbread-style
    labels: first aggregated level → ``label`` (or ``totals_label`` when all
    levels are aggregated), deeper ones → the fill string.

    Equivalent chained form (k+1 shuffles): ``pivot_table(...) →
    add_subtotals(level=0..k-1) → add_totals(axis=0)``. At scale this is the
    one to use: one exchange, partial aggregation map-side, no unions.
    """
    index = list(index)
    aggs = [F.sum(F.col(c)).alias(a) for c, a in values.items()] if isinstance(values, dict) else values
    gcols = [F.grouping(c).alias(f"__g_{c}") for c in index]
    rolled = df.rollup(*index).agg(*aggs, *gcols)

    sel = []
    for i, c in enumerate(index):
        g = F.col(f"__g_{c}")
        if i == 0:
            expr = F.when(g == 1, F.lit(totals_label)).otherwise(F.col(c).cast("string"))
        else:
            g_prev = F.col(f"__g_{index[i - 1]}")
            expr = (
                F.when(g_prev == 1, F.lit(_fill))          # deeper than the margin level
                .when(g == 1, F.lit(label))                 # first aggregated level
                .otherwise(F.col(c).cast("string"))
            )
        sel.append(expr.alias(c))
    vnames = list(values.values()) if isinstance(values, dict) else None
    sel += [F.col(a) for a in (vnames or [c for c in rolled.columns if not c.startswith("__g_") and c not in index])]
    out = rolled.select(*sel, *[F.col(f"__g_{c}") for c in index])

    from pyspark.sql import Window

    # margin rows sort after their group: per level, aggregated slots sort as
    # trailing nulls within their prefix, then by the grouping flag
    order = []
    for c in index:
        is_agg = F.col(f"__g_{c}") == 1
        order.append(F.when(is_agg, F.lit(None)).otherwise(F.col(c)).asc_nulls_last())
        order.append(F.col(f"__g_{c}"))
    w = Window.orderBy(*order)
    out = out.withColumn(POS, F.row_number().over(w).cast("double"))
    out = out.drop(*[f"__g_{c}" for c in index])

    ff = FlatFrame.from_df(out, index=index)
    ff = ff.tag("totals", label)
    ff = ff.tag("totals", totals_label)
    return ff
