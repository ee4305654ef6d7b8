"""Table-spec builder: FlatFrame → the data-viewer spec consumed by the
``<flatbread-table>`` web component.

Spec shape mirrors the reference (``flatbread/output/html/tablespec.py:22-37``):
``{values, columns: {values, names, dtypes, formatOptions}, index: {...}}``.

Scale discipline: the ONLY Spark action is a bounded collect —
``limit(max_rows+1)`` probes for truncation, then head/tail rows are fetched by
``__pos__`` order. A 100 TB FlatFrame ships at most ``max_rows`` rows to the
driver; everything upstream stays lazy.
"""
from __future__ import annotations

import datetime as _dt
import decimal
import json
import math
from typing import Any, Callable

from pyspark.sql import functions as F

from flatbread_spark.config import get_defaults
from flatbread_spark.frame import POS, FlatFrame

ColumnFormat = str | dict[str, Any]
ColumnFormats = dict[Any, ColumnFormat] | list[ColumnFormat]
FormatSpec = ColumnFormats | Callable[..., ColumnFormats]


class FormatResolver:
    """Format resolution: explicit metadata first, then smart-label detection
    (reference ``flatbread/output/formats.py:59-91``)."""

    def __init__(self, ff: FlatFrame):
        self.ff = ff
        defaults = get_defaults()
        self.output_formats: dict = defaults.get("output_formats", {})
        self.format_presets: dict = defaults.get("format_presets", {})
        self.dtype_mappings: dict = defaults.get("dtype_mappings", {})

    def simple_dtype(self, spark_type: str, default: str | None = "str") -> str | None:
        if spark_type.startswith("decimal"):
            return "float"
        return self.dtype_mappings.get(spark_type, default)

    def _column_text(self, column: Any) -> str:
        if isinstance(column, tuple):
            return " ".join(str(p).lower() for p in column)
        return str(column).lower()

    def resolve_format_type(self, column: Any) -> str | None:
        explicit = self.ff.formats.get(column)
        if explicit:
            return explicit
        text = self._column_text(column)
        for format_type, cfg in self.output_formats.items():
            for label in cfg.get("smart_labels", []):
                if label in text:
                    return format_type
        return None

    def _lookup(self, format_type: str | None, key: str) -> Any:
        if not format_type:
            return None
        for table in (self.output_formats, self.format_presets):
            if format_type in table:
                return table[format_type].get(key)
        return None

    def get_html_format(self, column: Any) -> dict[str, Any] | None:
        return self._lookup(self.resolve_format_type(column), "html_options")

    def get_excel_format(self, column: Any) -> str | None:
        return self._lookup(self.resolve_format_type(column), "excel_format")


class TableSpecBuilder:
    """Converts a FlatFrame to a data-viewer specification."""

    def __init__(self, ff: FlatFrame, max_rows: int | None = None, trim_size: int | None = None):
        display = get_defaults().get("display", {})
        self.ff = ff
        self.max_rows = display.get("max_rows", 30) if max_rows is None else max_rows
        self.trim_size = display.get("trim_size", 5) if trim_size is None else trim_size
        self._format_options: dict[Any, ColumnFormat] = {}
        self._resolver = FormatResolver(ff)
        self._rows: list | None = None
        self.truncated = False

    # ------------------------------------------------------------------ fetch
    def _fetch(self) -> list:
        """Bounded driver materialization: head probe, then head+tail on
        truncation. Each action collects ≤ max_rows+1 presentation rows."""
        if self._rows is not None:
            return self._rows
        ff = self.ff
        ordered = ff.df.orderBy(POS)
        head = ordered.limit(self.max_rows + 1).collect()
        if len(head) <= self.max_rows:
            self._rows = head
            return self._rows
        self.truncated = True
        tail = ff.df.orderBy(F.col(POS).desc()).limit(self.trim_size).collect()
        self._rows = head[: self.trim_size] + list(reversed(tail))
        return self._rows

    # ------------------------------------------------------------------- spec
    def build_spec(self) -> dict:
        return {
            "values": self._prepare_values(),
            "columns": {
                "values": self._prepare_columns(),
                "names": list(self.ff.col_names),
                "dtypes": self._prepare_column_dtypes(),
                "formatOptions": [self._get_format(self._col_key(c)) for c in self.ff.cols],
            },
            "index": {
                "values": self._prepare_index(),
                "names": list(self.ff.index_names),
                "dtypes": self._prepare_index_dtypes(),
                "formatOptions": [self._get_format(n) for n in self.ff.index_names],
            },
        }

    def get_spec_as_json(self) -> str:
        return json.dumps(
            self.build_spec(), separators=(",", ":"), default=_json_serialize
        )

    def _col_key(self, colinfo) -> Any:
        return colinfo.labels if self.ff.ncol_levels > 1 else colinfo.labels[0]

    def _prepare_values(self) -> list[list]:
        names = self.ff.value_names
        out = []
        for row in self._fetch():
            out.append([_none_if_na(row[n]) for n in names])
        return out

    def _prepare_columns(self) -> list:
        return [self._col_key(c) for c in self.ff.cols]

    def _prepare_index(self) -> list:
        idx = self.ff.index
        rows = self._fetch()
        if len(idx) == 1:
            return [row[idx[0]] for row in rows]
        return [tuple(row[c] for c in idx) for row in rows]

    def _prepare_column_dtypes(self) -> list[str]:
        types = dict(self.ff.df.dtypes)
        return [self._resolver.simple_dtype(types[c.name]) for c in self.ff.cols]

    def _prepare_index_dtypes(self) -> list[str | None]:
        # index levels are stored as strings (margin labels union in); report
        # 'str' like the reference does for object-dtype indexes
        return ["str" for _ in self.ff.index]

    # ---------------------------------------------------------------- formats
    def _get_format(self, key: Any) -> ColumnFormat | None:
        if key is None or key == "":
            return None
        if spec := self._format_options.get(key):
            return spec
        return self._resolver.get_html_format(key)

    def _resolve_dtype(self, key: Any) -> str | None:
        for c in self.ff.cols:
            if self._col_key(c) == key:
                return self._resolver.simple_dtype(dict(self.ff.df.dtypes)[c.name])
        if key in self.ff.index_names:
            return "str"
        raise KeyError(f"'{key}' not found in columns or index level names.")

    def set_format(self, key: Any, format_spec: ColumnFormat) -> None:
        """Explicit format for a column / index level; string specs resolve
        through presets with dtype compatibility (``tablespec.py:120-168``)."""
        if isinstance(format_spec, str):
            simple_dtype = self._resolve_dtype(key)
            presets = self._resolver.format_presets
            outputs = self._resolver.output_formats
            if format_spec in presets:
                cfg = presets[format_spec]
                allowed = cfg.get("dtypes", ["float", "int"])
                if simple_dtype in allowed:
                    self._format_options[key] = cfg.get("html_options", {})
                    return
                raise ValueError(
                    f"Preset '{format_spec}' is not compatible with '{key}' of "
                    f"dtype '{simple_dtype}'. This preset supports: {', '.join(allowed)}"
                )
            if format_spec in outputs:
                self._format_options[key] = outputs[format_spec].get("html_options", {})
                return
            available = list(presets) + list(outputs)
            raise ValueError(
                f"Unknown format '{format_spec}'. Available options: {', '.join(available)}"
            )
        self._format_options[key] = format_spec

    def set_formats(self, formats: FormatSpec) -> None:
        """Bulk formats: str (all columns), callable, list (positional), or
        dict with pattern matching (``tablespec.py:170-243``)."""
        col_keys = [self._col_key(c) for c in self.ff.cols]
        if isinstance(formats, str):
            formats = {k: formats for k in col_keys}
        if callable(formats):
            formats = formats(self.ff)
        if isinstance(formats, list):
            if len(formats) != len(col_keys):
                raise ValueError(f"Expected {len(col_keys)} formats, got {len(formats)}")
            formats = dict(zip(col_keys, formats))
        matches: dict[Any, ColumnFormat] = {}
        for pattern, spec in formats.items():
            for key in col_keys:
                if _pattern_match(key, pattern):
                    matches[key] = spec
            for name in self.ff.index_names:
                if name and _pattern_match(name, pattern):
                    matches[name] = spec
        for key, spec in matches.items():
            self.set_format(key, spec)


def _pattern_match(key: Any, pattern: Any) -> bool:
    """Reference matching rules (``tablespec.py:209-243``): equality; tuple
    prefix; scalar-in-any-tuple-level; substring for strings."""
    if key == pattern:
        return True
    if isinstance(key, tuple):
        if isinstance(pattern, tuple) and len(pattern) <= len(key):
            return key[: len(pattern)] == pattern
        return any(part == pattern for part in key)
    if isinstance(key, str) and isinstance(pattern, str):
        return pattern in key
    return False


def _none_if_na(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _json_serialize(obj: Any) -> Any:
    """Special-type handling (``tablespec.py:247-265``): ISO timestamps with
    date-only trimming, Decimal → float, NaN → null."""
    if isinstance(obj, _dt.datetime):
        ts = obj.isoformat()
        return ts[:-9] if ts.endswith("T00:00:00") else ts
    if isinstance(obj, _dt.date):
        return obj.isoformat()
    if isinstance(obj, decimal.Decimal):
        return float(obj)
    if isinstance(obj, float) and math.isnan(obj):
        return None
    if isinstance(obj, bytes):
        return obj.hex()
    if hasattr(obj, "item"):
        return obj.item()
    return str(obj)
