"""User-facing test-fixture factory: parameterized FlatFrames.

Spark analog of the reference's fixture factory ``make_test_df``
(``/root/reference/flatbread/testing/dataframe.py:5-162``), which builds a
pandas frame with configurable row/column MultiIndex levels, per-level label
duplication, level names, and a ``(row, col) -> value`` generator. Here the
same knobs produce a :class:`~flatbread_spark.frame.FlatFrame`: row levels
become string index *columns*, column levels become the per-value-column
label tuples (pure metadata), and ``__pos__`` follows row order — so a frame
from this factory drives every margin/percentage/sort operator exactly like
a reference frame from ``make_test_df`` drives the pandas pipeline.

Label grammar (reference parity, same strings byte-for-byte):

- innermost level: ``{prefix.lower()}{j}`` for item ``j`` — ``r0, r1, …`` /
  ``c0, c1, …``;
- outer level ``L``: group labels ``{prefix}_L{L}_G{g}``, each repeated
  ``dupes[L]`` times, truncated to the item count;
- level names: ``{prefix}{level}`` by default, a caller list, or suppressed.

One deliberate divergence: Spark columns must be *named*, so
``idx_names=False`` still materializes default physical column names — it
only marks the display metadata as unnamed (``index_names``), mirroring how
an unnamed pandas index prints. The reference's ``dtype=`` knob maps to a
Spark cast on the value columns.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import SparkSession

from flatbread_spark.frame import ColInfo, FlatFrame, make_col_name


def _levels_and_dupes(
    levels: int | None, dupes: Sequence[int] | None
) -> tuple[int, list[int]]:
    """Reference rules (``testing/dataframe.py:87-102``): levels default to
    ``len(dupes)`` or 1; dupes pad with 1s; longer dupes than levels is an
    error."""
    if levels is None:
        levels = len(dupes) if dupes is not None else 1
    elif dupes is not None and len(dupes) > levels:
        raise ValueError("duplicates cannot be longer than levels")
    full = list(dupes or [])
    full += [1] * (levels - len(full))
    return levels, full


def _level_labels(
    n_items: int, n_levels: int, prefix: str, dupes: Sequence[int]
) -> list[list[str]]:
    """Per-level label arrays, innermost last (reference grammar above)."""
    out: list[list[str]] = []
    for level in range(n_levels):
        if level == n_levels - 1:
            out.append([f"{prefix.lower()}{j}" for j in range(n_items)])
        else:
            labels, g = [], 0
            while len(labels) < n_items:
                labels.extend([f"{prefix}_L{level}_G{g}"] * max(dupes[level], 1))
                g += 1
            out.append(labels[:n_items])
    return out


def _level_names(
    prefix: str, n_levels: int, names: bool | Sequence[str] | None
) -> list[str] | None:
    if names is True:
        return [f"{prefix}{i}" for i in range(n_levels)]
    if isinstance(names, (list, tuple)):
        if n_levels == 1:
            # reference parity: a single-level index takes names[0]
            # (``make_index``: ``name=names[0]``), extras ignored
            return [names[0]]
        if len(names) != n_levels:
            # pandas MultiIndex.from_arrays raises on mismatch; keep that
            raise ValueError(
                f"expected {n_levels} names, got {len(names)}: {list(names)!r}"
            )
        return list(names)
    return None


def make_test_frame(
    spark: SparkSession,
    nrows: int,
    ncols: int,
    data_gen_f: Callable[[int, int], Any] | None = None,
    idx_levels: int | None = None,
    col_levels: int | None = None,
    idx_prefix: str = "R",
    col_prefix: str = "C",
    idx_names: bool | Sequence[str] | None = True,
    col_names: bool | Sequence[str] | None = True,
    idx_dupes: Sequence[int] | None = None,
    col_dupes: Sequence[int] | None = None,
    dtype: str | None = None,
) -> FlatFrame:
    """Build a FlatFrame with the reference fixture factory's shape knobs.

    ``data_gen_f(row, col)`` supplies cell values (default: the reference's
    positional labels ``f"{idx_prefix}{r}{col_prefix}{c}"``). ``dtype`` is a
    Spark type name to cast every value column to (e.g. ``"double"``).

    Example — 2 row levels with duplicated outer labels, numeric data::

        ff = make_test_frame(spark, 4, 3, idx_dupes=[2],
                             idx_names=["Year", "Quarter"],
                             data_gen_f=lambda r, c: (r + 1) * (c + 1),
                             dtype="double")
    """
    if nrows <= 0 or ncols <= 0:
        raise ValueError(f"nrows/ncols must be positive, got {nrows}x{ncols}")
    idx_levels, idx_dupes = _levels_and_dupes(idx_levels, idx_dupes)
    col_levels, col_dupes = _levels_and_dupes(col_levels, col_dupes)
    if data_gen_f is None:
        data_gen_f = lambda r, c: f"{idx_prefix}{r}{col_prefix}{c}"  # noqa: E731

    row_levels = _level_labels(nrows, idx_levels, idx_prefix, idx_dupes)
    col_level_labels = _level_labels(ncols, col_levels, col_prefix, col_dupes)

    display_idx_names = _level_names(idx_prefix, idx_levels, idx_names)
    display_col_names = _level_names(col_prefix, col_levels, col_names)
    # physical index column names are always needed (Spark); unnamed levels
    # fall back to the defaults while the metadata records the request
    physical_idx = display_idx_names or [f"{idx_prefix}{i}" for i in range(idx_levels)]

    labels_per_col = [
        tuple(col_level_labels[lvl][c] for lvl in range(col_levels))
        for c in range(ncols)
    ]
    infos: list[ColInfo] = []
    used: list[str] = list(physical_idx)
    for lt in labels_per_col:
        name = make_col_name(lt, used)
        used.append(name)
        infos.append(ColInfo(lt, name))

    from flatbread_spark.frame import POS

    # __pos__ = insertion order, assigned up front: pandas keeps the factory's
    # row order as-is, and lexical index sorting would diverge from it the
    # moment labels hit two digits (r10 < r2). Pre-assigning also skips the
    # from_df window entirely — fixture frames are tiny by construction.
    rows = [
        tuple(row_levels[lvl][r] for lvl in range(idx_levels))
        + tuple(data_gen_f(r, c) for c in range(ncols))
        + (float(r),)
        for r in range(nrows)
    ]
    df = spark.createDataFrame(
        rows, physical_idx + [ci.name for ci in infos] + [POS]
    )
    if dtype is not None:
        from pyspark.sql import functions as F

        df = df.select(
            *physical_idx,
            *[F.col(ci.name).cast(dtype).alias(ci.name) for ci in infos],
            POS,
        )
    ff = FlatFrame.from_df(
        df,
        index=physical_idx,
        value_cols=[ci.name for ci in infos],
        col_labels=[ci.labels for ci in infos],
        col_names=(
            display_col_names if display_col_names is not None else [None] * col_levels
        ),
    )
    if display_idx_names is None:
        ff.index_names = [None] * idx_levels
    return ff
