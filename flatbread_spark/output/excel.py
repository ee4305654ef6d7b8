"""Excel export: auto number formats from smart labels + border specs from
margin labels, written via openpyxl when available.

Intended behavior of the reference's (currently broken — stale imports
``excel.py:8`` and stale config paths ``excel.py:65-68``) module
``flatbread/output/excel/excel.py:11-97``: derive per-column Excel number
formats from the format config and row/column border markers from tracked
margin labels, then write a bounded table. The writer dependency is optional
(the reference delegates to the optional ``flatbreadxl``, ``excel.py:139-145``;
we delegate to openpyxl) but format/border computation is dependency-free and
fully tested.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

from flatbread_spark.config import get_defaults
from flatbread_spark.frame import POS, FlatFrame
from flatbread_spark.output.tablespec import FormatResolver


def _matches_label(target: Any, label: str) -> bool:
    """Reference ``excel.py:90-97``: tuple → any level equals; else equality."""
    if isinstance(target, tuple):
        return any(str(level) == label for level in target)
    return str(target) == label


def get_auto_number_formats(ff: FlatFrame) -> dict[Any, str]:
    """Per-column Excel number-format strings resolved through the same
    explicit → smart-label chain as HTML formats (``excel.py:11-45`` intent)."""
    resolver = FormatResolver(ff)
    formats: dict[Any, str] = {}
    for c in ff.cols:
        key = c.labels if ff.ncol_levels > 1 else c.labels[0]
        if fmt := resolver.get_excel_format(key):
            formats[key] = fmt
    return formats


def get_auto_border_specs(ff: FlatFrame, rows: list | None = None) -> dict[str, list[str]]:
    """Margin labels that actually appear on each axis → border markers
    (``excel.py:48-87`` intent, reading the *tracked* labels the reference's
    stale code path meant to read)."""
    defaults = get_defaults()
    margin_labels: set[str] = set()
    for tracked in ff.labels.values():
        margin_labels.update(str(lbl) for lbl in tracked if lbl is not None)
    transforms = defaults.get("transforms", {})
    for key in ("totals", "subtotals"):
        if lbl := transforms.get(key, {}).get("label"):
            margin_labels.add(lbl)
    if lbl := transforms.get("percentages", {}).get("label_pct"):
        margin_labels.add(lbl)

    specs: dict[str, list[str]] = {"rows": [], "columns": []}
    col_keys = [c.labels if ff.ncol_levels > 1 else c.labels[0] for c in ff.cols]
    row_keys: list[Any] = []
    if rows is not None:
        for row in rows:
            vals = tuple(row[c] for c in ff.index)
            row_keys.append(vals if len(vals) > 1 else vals[0])
    for label in sorted(margin_labels):
        if any(_matches_label(k, label) for k in row_keys):
            specs["rows"].append(label)
        if any(_matches_label(k, label) for k in col_keys):
            specs["columns"].append(label)
    return specs


def export_excel(
    ff: FlatFrame,
    filepath: str | Path,
    title: str | None = None,
    number_formats: dict | None = None,
    border_specs: dict | None = None,
    max_rows: int = 100_000,
) -> None:
    """Write the FlatFrame to ``.xlsx``. Bounded driver materialization:
    at most ``max_rows`` presentation rows are collected."""
    try:
        import openpyxl
        from openpyxl.styles import Border, Font, Side
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "openpyxl is required for Excel export. Install it with: "
            "pip install openpyxl"
        ) from e

    rows = ff.df.orderBy(POS).limit(max_rows).collect()
    auto_formats = get_auto_number_formats(ff)
    final_formats = {**auto_formats, **(number_formats or {})}
    auto_borders = get_auto_border_specs(ff, rows)
    final_borders = {
        "rows": [*auto_borders["rows"], *(border_specs or {}).get("rows", [])],
        "columns": [*auto_borders["columns"], *(border_specs or {}).get("columns", [])],
    }
    na_rep = get_defaults().get("display", {}).get("na_rep", "-")

    wb = openpyxl.Workbook()
    ws = wb.active
    ws.title = (title or "flatbread")[:31]
    thin_top = Border(top=Side(style="thin"))
    thin_left = Border(left=Side(style="thin"))
    bold = Font(bold=True)

    ncl = ff.ncol_levels
    nidx = len(ff.index)
    col_keys = [c.labels if ncl > 1 else (c.labels[0],) for c in ff.cols]
    # header rows: one per column level
    for lvl in range(ncl):
        for j, labels in enumerate(col_keys):
            cell = ws.cell(row=lvl + 1, column=nidx + 1 + j,
                           value=str(labels[lvl]) if lvl < len(labels) else "")
            cell.font = bold
    for i, name in enumerate(ff.index_names):
        cell = ws.cell(row=ncl, column=i + 1, value=str(name) if name else "")
        cell.font = bold

    for r, row in enumerate(rows):
        excel_r = ncl + 1 + r
        idx_vals = tuple(row[c] for c in ff.index)
        is_margin_row = any(
            _matches_label(idx_vals if nidx > 1 else idx_vals[0], lbl)
            for lbl in final_borders["rows"]
        )
        for i, c in enumerate(ff.index):
            cell = ws.cell(row=excel_r, column=i + 1, value=row[c])
            if is_margin_row:
                cell.border = thin_top
                cell.font = bold
        for j, cinfo in enumerate(ff.cols):
            v = row[cinfo.name]
            key = cinfo.labels if ncl > 1 else cinfo.labels[0]
            cell = ws.cell(
                row=excel_r, column=nidx + 1 + j, value=na_rep if v is None else v
            )
            if fmt := final_formats.get(key):
                cell.number_format = fmt
            if is_margin_row:
                cell.border = thin_top
                cell.font = bold
            if any(_matches_label(key, lbl) for lbl in final_borders["columns"]):
                cell.border = (
                    Border(top=Side(style="thin"), left=Side(style="thin"))
                    if is_margin_row
                    else thin_left
                )
    wb.save(str(filepath))
