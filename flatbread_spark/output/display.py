"""HTML display: render a FlatFrame as the ``<flatbread-table>`` web component.

Reference behavior: ``flatbread/output/html/display.py:96-110`` (template
manager), ``:14-93`` (DisplayConfig incl. margin-label extraction),
``templates/template.jinja.html:13-50`` (the embed script). The spec JSON is
built driver-side from a bounded collect (see ``tablespec.py``) — the one
Python→browser process boundary in the system.
"""
from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Any

from flatbread_spark.config import get_defaults
from flatbread_spark.frame import FlatFrame
from flatbread_spark.output.tablespec import FormatSpec, TableSpecBuilder

FLATBREAD_TABLE_VERSION = "v0.1.2"
FLATBREAD_TABLE_URL = (
    "https://cdn.jsdelivr.net/gh/flatbread-dataframes/"
    f"flatbread-wc-table-display@{FLATBREAD_TABLE_VERSION}/src/viewer.js"
)

# Shipped as a template FILE like the reference
# (flatbread/output/html/templates/template.jinja.html:13-50) — same
# structure and attributes, rendered with str.format instead of Jinja so
# the engine has no jinja2 dependency.
_TEMPLATE = (
    Path(__file__).parent / "templates" / "template.html"
).read_text()


@dataclass
class DisplayConfig:
    """Viewer attributes (``display.py:14-36``)."""

    locale: str | None = None
    na_rep: str = "-"
    margin_labels: set[str] = field(default_factory=set)

    collapse_columns: bool | None = None
    max_rows: int = 30
    max_columns: int = 30
    trim_size: int = 5
    separator: str = "..."
    no_wrap: bool = False
    column_border_levels: int | None = None
    section_levels: int | None = None

    hide_group_borders: bool = False
    hide_row_borders: bool = False
    hide_thead_border: bool = False
    hide_index_border: bool = False

    show_hover: bool = False

    @classmethod
    def from_flatframe(cls, ff: FlatFrame) -> "DisplayConfig":
        defaults = get_defaults()
        display = defaults.get("display", {})
        kwargs = {
            f.name: display[f.name]
            for f in fields(cls)
            if f.name in display and f.name != "margin_labels"
        }
        if defaults.get("locale") is not None:
            kwargs["locale"] = defaults["locale"]
        return cls(margin_labels=_extract_margin_labels(defaults, ff), **kwargs)

    def update(self, **kwargs: Any) -> None:
        for key, value in kwargs.items():
            if not hasattr(self, key):
                raise AttributeError(f"DisplayConfig has no field '{key}'")
            setattr(self, key, value)


def _extract_margin_labels(defaults: dict, ff: FlatFrame | None) -> set[str]:
    """Union of configured margin labels and labels the FlatFrame actually
    tracked during its transform chain (``display.py:62-85``)."""
    out: set[str] = set()
    for cfg in defaults.get("transforms", {}).values():
        for margin_key in cfg.get("margin_labels", []):
            if (value := cfg.get(margin_key)) is not None:
                out.add(value)
    if ff is not None:
        for tracked in ff.labels.values():
            out.update(str(lbl) for lbl in tracked if lbl is not None)
    return out


def render_html(spec_json: str, config: DisplayConfig) -> str:
    """Pure-string analog of the reference Jinja template (same attributes)."""
    lines: list[str] = []

    def set_value(cfg_key: str, attr: str) -> None:
        value = getattr(config, cfg_key)
        if value is not None:
            if isinstance(value, bool):
                value = str(value).lower()
            lines.append(f'    viewer.setAttribute("{attr}", {json.dumps(str(value))})')

    def set_bool(cfg_key: str, attr: str) -> None:
        if getattr(config, cfg_key):
            lines.append(f'    viewer.setAttribute("{attr}", "")')

    set_value("locale", "locale")
    set_value("na_rep", "na-rep")
    if config.margin_labels:
        joined = ";".join(sorted(config.margin_labels))
        lines.append(f'    viewer.setAttribute("margin-labels", {json.dumps(joined)})')
    set_value("section_levels", "section-levels")
    set_value("max_rows", "max-rows")
    set_value("max_columns", "max-columns")
    set_value("trim_size", "trim-size")
    set_value("separator", "separator")
    set_value("collapse_columns", "collapse-columns")
    set_bool("hide_group_borders", "hide-group-borders")
    set_bool("hide_row_borders", "hide-row-borders")
    set_bool("hide_thead_border", "hide-thead-border")
    set_bool("hide_index_border", "hide-index-border")
    set_value("column_border_levels", "column-border-levels")
    set_bool("no_wrap", "no-wrap")
    set_bool("show_hover", "show-hover")

    return _TEMPLATE.format(
        id=f"id-{uuid.uuid4()}",
        viewer_url=FLATBREAD_TABLE_URL,
        data=spec_json,
        attrs="\n".join(lines),
    )


class Display:
    """Fluent display handle: ``ff.display().set_max_rows(50)._repr_html_()``.

    Mirrors ``PitaDisplayMixin`` (``display.py:112-307``)."""

    def __init__(self, ff: FlatFrame):
        self.ff = ff
        self.config = DisplayConfig.from_flatframe(ff)
        self._builder: TableSpecBuilder | None = None

    @property
    def builder(self) -> TableSpecBuilder:
        if self._builder is None:
            self._builder = TableSpecBuilder(
                self.ff, max_rows=self.config.max_rows, trim_size=self.config.trim_size
            )
        return self._builder

    # fluent configuration -------------------------------------------------
    def configure(self, **kwargs: Any) -> "Display":
        self.config.update(**kwargs)
        return self

    def set_locale(self, locale: str) -> "Display":
        self.config.locale = locale
        return self

    def set_na_rep(self, na_rep: str) -> "Display":
        self.config.na_rep = na_rep
        return self

    def set_max_rows(self, n: int) -> "Display":
        self.config.max_rows = n
        self._builder = None
        return self

    def set_max_columns(self, n: int) -> "Display":
        self.config.max_columns = n
        return self

    def set_trim_size(self, n: int) -> "Display":
        self.config.trim_size = n
        self._builder = None
        return self

    def set_margin_labels(self, *labels: str) -> "Display":
        self.config.margin_labels = set(labels)
        return self

    def set_separator(self, sep: str) -> "Display":
        """Truncation indicator (reference ``display.py:170-173``)."""
        self.config.separator = sep
        return self

    def hide_borders(self, hide: bool = True) -> "Display":
        """All four border groups at once (reference ``display.py:175-181``)."""
        self.config.hide_group_borders = hide
        self.config.hide_row_borders = hide
        self.config.hide_thead_border = hide
        self.config.hide_index_border = hide
        return self

    def show_group_borders(self, show: bool = True) -> "Display":
        self.config.hide_group_borders = not show
        return self

    def show_row_borders(self, show: bool = True) -> "Display":
        self.config.hide_row_borders = not show
        return self

    def show_header_border(self, show: bool = True) -> "Display":
        self.config.hide_thead_border = not show
        return self

    def show_index_border(self, show: bool = True) -> "Display":
        self.config.hide_index_border = not show
        return self

    def show_hover(self, show: bool = True) -> "Display":
        self.config.show_hover = show
        return self

    def collapse_columns(self, collapse: bool = True) -> "Display":
        self.config.collapse_columns = collapse
        return self

    def set_section_levels(self, levels: int) -> "Display":
        self.config.section_levels = levels
        return self

    def set_no_wrap(self, no_wrap: bool = True) -> "Display":
        self.config.no_wrap = no_wrap
        return self

    def set_column_border_levels(self, levels: int) -> "Display":
        self.config.column_border_levels = levels
        return self

    def format(self, key: Any, format_spec: Any) -> "Display":
        self.builder.set_format(key, format_spec)
        return self

    def format_columns(self, formats: FormatSpec) -> "Display":
        self.builder.set_formats(formats)
        return self

    def get_format_presets(self, dtype: str | None = None) -> dict[str, dict]:
        """All available format presets (reference ``display.py:256-281``)."""
        resolver = self.builder._resolver
        presets: dict[str, dict] = {}
        for name, cfg in resolver.output_formats.items():
            presets[name] = cfg.get("html_options", {})
        for name, cfg in resolver.format_presets.items():
            if dtype is None or dtype in cfg.get("dtypes", []):
                presets[name] = cfg.get("html_options", {})
        return presets

    # output ---------------------------------------------------------------
    def data_spec(self) -> dict:
        return self.builder.build_spec()

    def get_json(self) -> str:
        return self.builder.get_spec_as_json()

    def _repr_html_(self) -> str:
        """Render the web-component HTML.

        Truncation contract at scale: the reference embeds the FULL frame
        and lets ``<flatbread-table>`` trim client-side via ``max-rows`` /
        ``trim-size`` — unbounded payload, a non-starter for a Spark result.
        This engine ships only the head+tail the component would display
        anyway (``TableSpecBuilder._fetch``, 2·trim_size rows), and when it
        truncated, lowers the rendered ``max-rows`` attribute below the
        shipped row count so the component's own trim UI (the ``separator``
        ellipsis rows) still engages on exactly those rows — the rendered
        view matches the reference's pixel-for-pixel while the payload
        stays bounded."""
        spec = self.get_json()
        if self.builder.truncated:
            import dataclasses

            shown = dataclasses.replace(
                self.config,
                max_rows=max(1, 2 * self.builder.trim_size - 1),
                margin_labels=set(self.config.margin_labels),
            )
            return render_html(spec, shown)
        return render_html(spec, self.config)

    to_html = _repr_html_
    # reference accessor aliases (``display.py:305-307``)
    configure_display = configure
    get_table_spec = data_spec
    get_table_spec_json = get_json
