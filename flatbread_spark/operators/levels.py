"""Axis utilities: margin-aware sorting, level insertion, explicit-order sort.

Parity: ``flatbread/axes.py:58-368`` and ``flatbread/tooling.py:98-118``.

Row-axis sorts produce a *new* ``__pos__`` (row_number over the computed sort
keys); they never physically move rows — order is data in this engine. The
"first appearance" rank pandas gets from ``enumerate(idx.unique())``
(``axes.py:118-125``) is ``min(__pos__) over (partition by level-value)``.
Column-axis variants are pure metadata permutations.
"""
from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from flatbread_spark.frame import POS, ColInfo, FlatFrame
from flatbread_spark.operators.aggregation import _resolve_levels
from flatbread_spark.operators.totals import (
    DEFAULT_SUBTOTALS_LABEL,
    DEFAULT_TOTALS_LABEL,
    _resolve_axis,
)

_BIG = 1e18


def sort_aggregates(
    ff: FlatFrame,
    axis=0,
    level=None,
    labels: Sequence[str] | None = None,
    aggregates_last: bool = True,
    sort_remaining: bool = True,
) -> FlatFrame:
    """Stable sort placing aggregate labels first/last
    (reference ``axes.py:58-132``).

    Parity note (found by the live-reference property tests): the reference
    executes ONE stable global ``sort_index(level=..., key=...)`` — NOT a
    hierarchical within-group sort. The leading sort keys are the TARGET
    levels (in the order given), each mapped (is-aggregate → ±∞, else
    first-appearance rank over the whole frame, ``axes.py:118-125``);
    remaining levels participate only when ``sort_remaining``, in index
    order, by natural (lexical) value. With ``level=1`` on a 2-level index
    this pulls every Subtotals row to the global tail, AFTER all groups —
    matching pandas, diverging from a per-group sort."""
    labels = list(labels or [])
    axis = _resolve_axis(axis)
    if axis == 1:
        return _sort_cols(ff, level, labels, aggregates_last, sort_remaining)

    targets = (
        list(range(ff.nlevels)) if level is None else _resolve_levels(ff, level)
    )
    agg_score = F.lit(_BIG) if aggregates_last else F.lit(-1.0)

    order: list[Column] = []
    for i in targets:
        col = F.col(ff.index[i])
        appearance = F.min(POS).over(Window.partitionBy(col))
        order.append(F.when(col.isin(labels), agg_score).otherwise(appearance))
    if sort_remaining:
        tset = set(targets)
        for i in range(ff.nlevels):
            if i not in tset:
                order.append(F.col(ff.index[i]))
    order.append(F.col(POS))  # stable tiebreak

    new_pos = F.row_number().over(Window.orderBy(*order)).cast("double")
    return ff._copy(df=ff.df.withColumn(POS, new_pos))


def _sort_cols(ff, level, labels, aggregates_last, sort_remaining) -> FlatFrame:
    """Column-axis variant: same pandas ``sort_index`` key order as the row
    path (target levels lead with the aggregate/appearance mapping; remaining
    levels lexical only when ``sort_remaining``); ``sorted`` is stable, so no
    explicit position tiebreak is needed."""
    ncl = ff.ncol_levels
    if level is None:
        targets = list(range(ncl))
    else:
        lvls = [level] if isinstance(level, (int, str)) else list(level)
        targets = [lv if isinstance(lv, int) else ff.col_names.index(lv) for lv in lvls]
    appearance: list[dict] = []
    for i in range(ncl):
        seen: dict = {}
        for c in ff.cols:
            seen.setdefault(c.labels[i], len(seen))
        appearance.append(seen)

    tset = set(targets)

    def key(c: ColInfo):
        ks = []
        for i in targets:
            el = c.labels[i]
            ks.append(
                _BIG if (el in labels and aggregates_last)
                else -1 if el in labels
                else appearance[i][el]
            )
        if sort_remaining:
            for i in range(ncl):
                if i not in tset:
                    ks.append(str(c.labels[i]))
        return tuple(ks)

    return ff._copy(cols=sorted(ff.cols, key=key))


def sort_totals(
    ff: FlatFrame,
    axis=0,
    level=None,
    labels: Sequence[str] | None = None,
    totals_last: bool = True,
    sort_remaining: bool = True,
) -> FlatFrame:
    """Totals/Subtotals to their conventional position (reference
    ``axes.py:135-206``); defaults to the configured margin labels."""
    if labels is None:
        labels = [DEFAULT_SUBTOTALS_LABEL, DEFAULT_TOTALS_LABEL]
        tracked = ff.tracked("totals")
        labels = list(dict.fromkeys(labels + tracked))
    return sort_aggregates(
        ff, axis=axis, level=level, labels=labels,
        aggregates_last=totals_last, sort_remaining=sort_remaining,
    )


def add_level(
    ff: FlatFrame,
    value: Any,
    level: int = 0,
    level_name: Any = None,
    axis=0,
) -> FlatFrame:
    """Insert a constant level into the row or column axis (reference
    ``axes.py:210-337``). Rows: one new literal key column — O(0) shuffle.
    Columns: pure metadata. Per-row value lists (reference ``axes.py:253-258``)
    are supported on the column axis only; at scale a per-row list on the row
    axis would be a zip-by-position anti-pattern — join a real column instead."""
    axis = _resolve_axis(axis)
    if axis == 0:
        pos = level if level >= 0 else ff.nlevels + level + 1
        name = f"lvl_{pos}"
        existing = set(ff.df.columns)
        while name in existing:
            name += "_"
        if isinstance(value, list):
            # Per-row list values (reference ``axes.py:253-258``): inherently
            # order-positional — zip by the frame's ``__pos__`` order via a
            # broadcast (rank → value) lookup. Like the reference, the list
            # length is validated against the row count (one eager count; the
            # reference's eager index build does the same implicitly). Only
            # sane for presentation-sized frames — at data scale join a real
            # column instead.
            n = ff.df.count()
            if len(value) != n:
                raise ValueError(
                    f"Length of values list ({len(value)}) must match "
                    f"length of index ({n})"
                )
            spark = ff.df.sparkSession
            lookup = spark.createDataFrame(
                [(i + 1, str(v)) for i, v in enumerate(value)],
                schema="__rn__ int, __lvl__ string",
            )
            w = Window.orderBy(F.col(POS))
            df = (
                ff.df.withColumn("__rn__", F.row_number().over(w))
                .join(F.broadcast(lookup), "__rn__")
                .withColumnRenamed("__lvl__", name)
                .drop("__rn__")
            )
        else:
            df = ff.df.withColumn(name, F.lit(str(value)))
        index = ff.index[:pos] + [name] + ff.index[pos:]
        index_names = ff.index_names[:pos] + [level_name] + ff.index_names[pos:]
        return ff._copy(df=df, index=index, index_names=index_names)

    ncl = ff.ncol_levels
    pos = level if level >= 0 else ncl + level + 1
    if isinstance(value, list):
        if len(value) != len(ff.cols):
            raise ValueError(
                f"Length of values list ({len(value)}) must match length of columns ({len(ff.cols)})"
            )
        vals = value
    else:
        vals = [value] * len(ff.cols)
    cols = [
        ColInfo(c.labels[:pos] + (v,) + c.labels[pos:], c.name)
        for c, v in zip(ff.cols, vals)
    ]
    col_names = list(ff.col_names[:pos]) + [level_name] + list(ff.col_names[pos:])
    return ff._copy(cols=cols, col_names=col_names)


def sort_index_from_list(
    ff: FlatFrame,
    order: Sequence[Any],
    axis=0,
    level: int | str | None = None,
) -> FlatFrame:
    """Sort an axis by an explicit label order (reference ``tooling.py:111-118``);
    labels missing from ``order`` sort last (pandas NaN-key semantics)."""
    axis = _resolve_axis(axis)
    if axis == 1:
        lv = 0 if level is None else (level if isinstance(level, int) else ff.col_names.index(level))
        rank = {v: i for i, v in enumerate(order)}

        def key(c: ColInfo):
            return (rank.get(c.labels[lv], len(order)),)

        return ff._copy(cols=sorted(ff.cols, key=key))

    lv = 0 if level is None else _resolve_levels(ff, level)[0]
    col = F.col(ff.index[lv])
    arr = F.array(*[F.lit(str(v)) for v in order])
    rank = F.array_position(arr, col)  # 0 when absent
    key = F.when(rank == 0, F.lit(_BIG)).otherwise(rank.cast("double"))
    others = [F.col(c) for i, c in enumerate(ff.index) if i != lv]
    new_pos = F.row_number().over(Window.orderBy(key, *others, F.col(POS))).cast("double")
    return ff._copy(df=ff.df.withColumn(POS, new_pos))
