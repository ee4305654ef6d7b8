"""Difference blocks: the ``differences`` transform the reference *reserves*
but never ships.

The reference's config declares a differences transform (label_n "n",
label_diff "diff" — ``flatbread/config/config.defaults.json:22-27``), its
label tracker knows the kind (``flatbread/chaining.py:79``), totals auto-
ignore tracked difference labels (``flatbread/transforms/totals.py:30``), and
the display layer smart-formats ``diff`` columns as signed integers
(``config.defaults.json:37-44``) — yet no operator produces them. This module
completes the slot with pandas ``DataFrame.diff`` semantics:

- axis=1: each data column minus the previous data column (row-local
  arithmetic — no shuffle).
- axis=0: each cell minus the value in the *previous data row* (margin rows
  are neither sources nor targets), via an ignore-nulls ``last`` window over
  ``__pos__`` — margins keep null diffs.

Output mirrors ``add_percentages``: original block keyed ``n``, diff block
keyed ``diff`` as a new outer column level; labels tagged so later totals
don't sum diff columns.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from flatbread_spark.frame import POS, ColInfo, FlatFrame, make_col_name
from flatbread_spark.operators.percentages import _resolve_axis


def _resolve_ignored_keys(ff: FlatFrame, ignore_keys) -> list[str]:
    keys = [] if ignore_keys is None else (
        [ignore_keys] if isinstance(ignore_keys, str) else list(ignore_keys)
    )
    for kind in ("percentages", "differences"):
        keys.extend(k for k in ff.tracked(kind) if k not in keys)
    return keys


def add_differences(
    ff: FlatFrame,
    axis=1,
    label_n: str = "n",
    label_diff: str = "diff",
    periods: int = 1,
    ignore_keys: str | Sequence[str] | None = None,
) -> FlatFrame:
    """Append a diff block (new outer column level {n, diff})."""
    axis = _resolve_axis(axis)
    if axis == 2:
        raise ValueError("add_differences supports axis 0 or 1")
    keys = _resolve_ignored_keys(ff, ignore_keys)
    dcols = ff.data_cols(keys) if keys else list(ff.cols)
    if not dcols:
        raise ValueError("no data columns")
    fresh = len(dcols) == len(ff.cols)

    df = ff.df
    used = list(df.columns)
    new_cols: list[ColInfo] = []
    exprs: list[Column] = []

    if axis == 1:
        for i, c in enumerate(dcols):
            if i - periods < 0:
                e = F.lit(None).cast("double")
            else:
                prev = dcols[i - periods]
                e = F.col(c.name).cast("double") - F.col(prev.name).cast("double")
            exprs.append(e)
    else:
        if periods != 1:
            raise ValueError("axis=0 differences support periods=1 only")
        # previous *data* row per column: ignore-nulls last() over __pos__ of
        # the margin-masked value — margin rows contribute nothing and get
        # null diffs. Unpartitioned window is fine: FlatFrames are
        # presentation-shaped (see frame.py scale notes).
        totals_keys = [k for k in ff.tracked("totals") if k is not None]
        mask = ff.data_row_mask(totals_keys) if totals_keys else F.lit(True)
        w = Window.orderBy(POS).rowsBetween(Window.unboundedPreceding, -1)
        for c in dcols:
            masked = F.when(mask, F.col(c.name).cast("double"))
            prev = F.last(masked, ignorenulls=True).over(w)
            exprs.append(F.when(mask, F.col(c.name).cast("double") - prev))

    for c, e in zip(dcols, exprs):
        labels = (label_diff,) + (c.labels if fresh else c.labels[1:])
        name = make_col_name(labels, used)
        used.append(name)
        new_cols.append(ColInfo(labels, name))
    out = df.select(
        *ff.index, POS, *[c.name for c in ff.cols],
        *[e.alias(c.name) for c, e in zip(new_cols, exprs)],
    )

    if fresh:
        n_block = [ColInfo((label_n,) + c.labels, c.name) for c in ff.cols]
        col_names = [None] + list(ff.col_names)
    else:
        n_block = list(ff.cols)
        col_names = list(ff.col_names)

    res = ff._copy(df=out, cols=n_block + new_cols, col_names=col_names)
    return res.tag("differences", label_diff)
