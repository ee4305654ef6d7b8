"""Property tests against the LIVE reference library as oracle.

The round-4 verdict asked for randomized-MultiIndex parity sweeps of the two
least-exercised §2 behaviors: ``sort_aggregates(sort_remaining=False)`` and
``add_percentages(interleaf=True)`` + the re-derive path. These tests import
the reference package from ``/root/reference`` (pandas implementation) and
compare axis order, column labels, and values on randomized shapes.

Findings these tests encode (each verified against the reference source):

- ``sort_aggregates`` is ONE stable global ``sort_index(level=..., key=...)``
  — not a within-group sort (the docstring says "within groups", the code
  ``axes.py:127-132`` does a global keyed sort). Target levels lead the key
  order; remaining levels join only when ``sort_remaining``, lexically.
- The reference's AUTO re-derive path is unreachable: ``tag_labels`` stores
  under ``labels['percentages']`` (plural) but ``_resolve_ignored_keys``
  reads ``labels['percentage']`` (singular, ``transforms/percentages.py:28``)
  — so only an explicit ``ignore_keys`` reaches the documented
  "append without a new level" branch. Our engine implements the INTENDED
  tracking (the same call works without explicit keys); parity is asserted
  on the explicit-keys path both engines share.
- ``interleaf=True`` on the re-derive path returns an EMPTY frame in the
  reference (``reindex_by_levels`` against the 2-level data frame after the
  rotate drops every column) — intended semantics asserted engine-side only.
"""
import os
import sys

import pytest

REF = "/root/reference"
if REF not in sys.path:  # live oracle, read-only
    sys.path.insert(0, REF)

try:
    import flatbread  # noqa: F401 — registers the .pita accessor
except Exception:  # pragma: no cover — no reference checkout
    flatbread = None

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF) or flatbread is None,
    reason="reference checkout not available",
)

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from flatbread_spark import FlatFrame

SET = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# randomized 2-level frames: shuffled group order, shuffled inner labels,
# margin labels injected mid-group, variable group sizes
mi_frames = st.tuples(
    st.permutations(["B", "C", "A"]),
    st.permutations(["x2", "Subtotals", "z", "a"]),
    st.integers(2, 4),
    st.integers(0, 97),
)


# same shapes without margin-named data labels — add_subtotals/add_totals
# (correctly, on both sides) reject a frame whose index already contains
# the margin key
mi_frames_clean = st.tuples(
    st.permutations(["B", "C", "A"]),
    st.permutations(["x2", "w", "z", "a"]),
    st.integers(2, 4),
    st.integers(0, 97),
)


def build_mi(spec):
    groups, inner, k, seed = spec
    rows, vals = [], []
    v = seed
    for gi, g in enumerate(groups):
        for lbl in inner[: k if gi % 2 == 0 else max(2, k - 1)]:
            rows.append((g, lbl))
            vals.append([v % 13, (v * 7) % 11])
            v += 1
    idx = pd.MultiIndex.from_tuples(rows, names=["g", "r"])
    return pd.DataFrame(vals, index=idx, columns=["x", "y"])


def assert_frames_equal(ref, ours, atol=1e-12):
    assert list(ref.index) == list(ours.index)
    assert list(ref.columns) == list(ours.columns)
    assert ref.shape == ours.shape
    assert np.allclose(
        ref.values.astype(float), ours.values.astype(float),
        rtol=0, atol=atol, equal_nan=True,
    )


# Apportioned rounding is exact-by-construction on both sides, but the two
# engines accumulate the running sum differently: the reference cumsums RAW
# DOUBLES (pandas cumsum, sequential float adds — 22.91666..+36.45833..
# lands at 59.374999999999993 -> round2 59.37), while this engine rounds
# each term to 12 digits and accumulates in DECIMAL (exact, order-free,
# DuckDB-reproducible: 59.375 -> round2 59.38). When the true cumulative
# sits within float-error of a x.5 boundary the two disciplines split it
# differently, moving 10^-nd between two ADJACENT cells (sums preserved on
# both sides). The decimal ladder is the deliberate choice — it is what the
# driver's DuckDB oracle replays and what stays deterministic under
# partition reordering at scale — so rounded comparisons carry a one-grid-
# step tolerance instead of bit-equality.
GRID_ATOL = 0.0101


@given(spec=mi_frames, level=st.sampled_from([None, 0, 1, [1, 0]]),
       last=st.booleans(), remaining=st.booleans())
@settings(**SET)
def test_sort_aggregates_matches_reference(spark, spec, level, last, remaining):
    from flatbread.axes import sort_aggregates as ref_sort

    pdf = build_mi(spec)
    kw = dict(level=level, labels=["Subtotals"],
              aggregates_last=last, sort_remaining=remaining)
    ref = ref_sort(pdf, axis=0, **kw)
    ours = FlatFrame.from_pandas(spark, pdf).sort_aggregates(axis=0, **kw).to_pandas()
    assert_frames_equal(ref, ours)


@given(spec=mi_frames, last=st.booleans(), remaining=st.booleans())
@settings(**SET)
def test_sort_aggregates_columns_matches_reference(spark, spec, last, remaining):
    from flatbread.axes import sort_aggregates as ref_sort

    pdf = build_mi(spec).T  # 2-level COLUMNS, 1-level index
    kw = dict(level=None, labels=["Subtotals"],
              aggregates_last=last, sort_remaining=remaining)
    ref = ref_sort(pdf, axis=1, **kw)
    ours = FlatFrame.from_pandas(spark, pdf).sort_aggregates(axis=1, **kw).to_pandas()
    assert_frames_equal(ref, ours)


flat_frames = st.tuples(
    st.permutations(["r2", "r0", "r1"]),
    st.lists(st.integers(1, 60), min_size=6, max_size=6),
)


def build_flat(spec):
    order, vals = spec
    idx = pd.Index(order, name="r")
    return pd.DataFrame(
        {"x": vals[:3], "y": vals[3:]}, index=idx
    )


@given(spec=flat_frames, axis=st.sampled_from([0, 1, 2]),
       interleaf=st.booleans(), nd=st.sampled_from([-1, 2]))
@example(spec=(["r2", "r0", "r1"], [1, 14, 60, 1, 56, 60]),
         axis=2, interleaf=False, nd=2)
@settings(**SET)
def test_add_percentages_fresh_matches_reference(spark, spec, axis, interleaf, nd):
    """Cross-engine sums carry the SAME one-grid-step tolerance as values.

    A 1e-9 cross-engine sum assertion is unsatisfiable whenever the exact
    .5 rounding boundary lands on a column's FINAL cumsum: apportioned
    rounding telescopes (sum of rounded cells == rounding of the final
    cumsum), so each engine's column sum IS its own rounding model applied
    to the total — banker's for the reference, HALF_UP for this engine —
    and the two models legitimately split an exact .5 one grid step apart.
    The pinned @example (75/192*100 cumulative = 78.125 exactly) is the
    Hypothesis falsifying case: ref column sum 78.12 (banker's), ours
    78.13 (HALF_UP, agreeing with the DuckDB oracle). Both sides DO
    preserve their own rounding of the total, which the on-grid assertion
    below checks per engine.
    """
    from flatbread.transforms.percentages import add_percentages as ref_addpct
    from flatbread.transforms.totals import add_totals as ref_addtot

    pdf = build_flat(spec)
    kw = dict(axis=axis, ndigits=nd, base=100, interleaf=interleaf)
    ref = ref_addpct(ref_addtot(pdf, axis=2), **kw)
    ours = (
        FlatFrame.from_pandas(spark, pdf)
        .add_totals(axis=2)
        .add_percentages(**kw)
        .to_pandas()
    )
    assert_frames_equal(ref, ours, atol=GRID_ATOL if nd >= 0 else 1e-9)
    if nd >= 0:
        ref_sums = ref.values.astype(float).sum(axis=0)
        our_sums = ours.values.astype(float).sum(axis=0)
        # cross-engine: sums may differ by at most ONE grid step (the two
        # rounding models of the same exact total), never more
        assert np.allclose(ref_sums, our_sums, atol=GRID_ATOL)
        # per-engine sum preservation: apportioning telescopes, so each
        # side's column sum must itself sit ON the rounding grid (it is
        # that side's rounding of the exact total, not an accumulation of
        # independent per-cell errors)
        grid = 10.0 ** (-nd)
        for sums in (ref_sums, our_sums):
            assert np.allclose(
                np.round(sums / grid) * grid, sums, atol=1e-9
            ), f"column sums fell off the {grid} rounding grid: {sums}"


@given(spec=flat_frames, axis=st.sampled_from([1, 2]))
@settings(**SET)
def test_add_percentages_rederive_matches_reference(spark, spec, axis):
    """Second add_percentages on a frame that already has pct columns —
    the shared explicit-ignore_keys path (see module docstring for why the
    reference's auto path is unreachable)."""
    from flatbread.transforms.percentages import add_percentages as ref_addpct
    from flatbread.transforms.totals import add_totals as ref_addtot

    pdf = build_flat(spec)
    ref1 = ref_addpct(ref_addtot(pdf, axis=2), axis=2, ndigits=2, base=100)
    ours1 = (
        FlatFrame.from_pandas(spark, pdf)
        .add_totals(axis=2)
        .add_percentages(axis=2, ndigits=2, base=100)
    )
    kw = dict(axis=axis, ndigits=3, base=100, label_pct="pct2", ignore_keys="pct")
    ref2 = ref_addpct(ref1, **kw)
    ours2 = ours1.add_percentages(**kw).to_pandas()
    assert_frames_equal(ref2, ours2, atol=GRID_ATOL)


def test_rederive_auto_tracking_is_intended_semantics(spark):
    """Engine-side pin of the two reference defects we do NOT reproduce:
    (a) tracked pct labels auto-ignore on re-derive (no explicit
    ignore_keys needed — singular/plural attrs bug upstream), and
    (b) interleaf on re-derive pairs columns instead of emptying the frame."""
    pdf = pd.DataFrame(
        {"x": [1, 2, 3], "y": [4, 5, 6]}, index=pd.Index(["a", "b", "c"], name="r")
    )
    ff = (
        FlatFrame.from_pandas(spark, pdf)
        .add_totals(axis=2)
        .add_percentages(axis=2, ndigits=2, base=100)
    )
    auto = ff.add_percentages(axis=2, ndigits=3, base=100, label_pct="pct2")
    explicit = ff.add_percentages(
        axis=2, ndigits=3, base=100, label_pct="pct2", ignore_keys="pct"
    )
    assert_frames_equal(explicit.to_pandas(), auto.to_pandas())
    # no new column level was added (re-derive, not fresh)
    assert auto.ncol_levels == 2
    inter = ff.add_percentages(
        axis=2, ndigits=3, base=100, label_pct="pct2", interleaf=True
    ).to_pandas()
    assert len(inter.columns) == 9  # n + pct + pct2 per base column, non-empty


@given(spec=mi_frames_clean, skip=st.booleans(), lvlname=st.booleans())
@settings(**SET)
def test_totals_family_matches_reference(spark, spec, skip, lvlname):
    """add_totals (axes 0/1/2), add_subtotals (skip_single_rows,
    include_level_name), and drop_totals on one randomized frame — the §2
    margin core against the live reference."""
    from flatbread.transforms import totals as rtot

    pdf = build_mi(spec)
    lift = lambda: FlatFrame.from_pandas(spark, pdf)  # noqa: E731
    for axis in (0, 1, 2):
        assert_frames_equal(
            rtot.add_totals(pdf, axis=axis),
            lift().add_totals(axis=axis).to_pandas(),
        )
    assert_frames_equal(
        rtot.add_subtotals(
            pdf, axis=0, skip_single_rows=skip, include_level_name=lvlname
        ),
        lift()
        .add_subtotals(axis=0, skip_single_rows=skip, include_level_name=lvlname)
        .to_pandas(),
    )
    t = rtot.add_totals(pdf, axis=2)
    assert_frames_equal(
        rtot.drop_totals(t, ignore_keys=["Totals"]),
        lift().add_totals(axis=2).drop_totals().to_pandas(),
    )


@given(spec=mi_frames_clean,
       aggfunc=st.sampled_from(["mean", "max", "min", "count", "sum"]),
       axis=st.sampled_from([0, 1]))
@settings(**SET)
def test_agg_family_matches_reference(spark, spec, aggfunc, axis):
    """add_agg over the named-aggfunc surface on both axes, plus add_subagg
    at level 0 (innermost-first placement) against the live reference."""
    from flatbread.transforms import aggregation as ragg

    pdf = build_mi(spec)
    assert_frames_equal(
        ragg.add_agg(pdf, aggfunc, axis=axis),
        FlatFrame.from_pandas(spark, pdf).add_agg(aggfunc, axis=axis).to_pandas(),
    )
    assert_frames_equal(
        ragg.add_subagg(pdf, aggfunc, axis=0, level=0),
        FlatFrame.from_pandas(spark, pdf)
        .add_subagg(aggfunc, axis=0, level=0)
        .to_pandas(),
    )


vc_series = st.lists(
    st.sampled_from(["b", "a", "c", "dd", None]), min_size=2, max_size=12
).filter(lambda xs: any(x is not None for x in xs))


@given(vals=vc_series, nd=st.sampled_from([-1, 2]))
@settings(**SET)
def test_value_counts_matches_reference(spark, vals, nd):
    """Null-inclusive value_counts with totals + apportioned pct against the
    reference Series accessor (ties broken identically: count desc, value
    asc)."""
    from flatbread_spark.operators.counts import value_counts

    s = pd.Series(vals, name="v")
    ref = s.pita.value_counts(add_pct=True, ndigits=nd, base=100)
    sdf = spark.createDataFrame([(x,) for x in vals], "v string")
    ours = value_counts(sdf, "v", add_pct=True, ndigits=nd, base=100).to_pandas()
    # pandas sorts ties by first appearance; the engine pins count desc,
    # value asc — align on the engine's deterministic order for compare
    ref = ref.reindex(ours.index)
    assert list(ref.index) == list(ours.index)
    assert list(ref.columns) == list(ours.columns)
    assert np.allclose(ref.values.astype(float), ours.values.astype(float),
                       atol=GRID_ATOL if nd >= 0 else 1e-9)


@given(spec=mi_frames_clean, pos=st.sampled_from([0, 1, 2]))
@settings(**SET)
def test_add_level_matches_reference(spark, spec, pos):
    """add_level: scalar insert at every row position, column-axis insert,
    and per-row list values, against the live reference."""
    from flatbread.axes import add_level as ref_add

    pdf = build_mi(spec)
    assert_frames_equal(
        ref_add(pdf, "L", level=pos, level_name="nl", axis=0),
        FlatFrame.from_pandas(spark, pdf)
        .add_level("L", level=pos, level_name="nl", axis=0)
        .to_pandas(),
    )
    assert_frames_equal(
        ref_add(pdf, "blk", level=0, level_name="k", axis=1),
        FlatFrame.from_pandas(spark, pdf)
        .add_level("blk", level=0, level_name="k", axis=1)
        .to_pandas(),
    )
    vals = ["p" if i % 2 == 0 else "q" for i in range(len(pdf))]
    assert_frames_equal(
        ref_add(pdf, vals, level=1, level_name="pr", axis=0),
        FlatFrame.from_pandas(spark, pdf)
        .add_level(vals, level=1, level_name="pr", axis=0)
        .to_pandas(),
    )


@given(spec=mi_frames_clean, order=st.permutations(["B", "A", "C"]))
@settings(**SET)
def test_sort_index_from_list_matches_reference(spark, spec, order):
    from flatbread.tooling import sort_index_from_list as ref_sort

    pdf = build_mi(spec)
    assert_frames_equal(
        ref_sort(pdf, list(order), axis=0, level=0),
        FlatFrame.from_pandas(spark, pdf)
        .sort_index_from_list(list(order), axis=0, level=0)
        .to_pandas(),
    )


def test_offset_date_field_matches_reference(spark):
    """Year-alignment shift: time-of-day preserved, Feb-29 clamped, values
    identical to the reference's DateOffset group shift (column order and
    row order are presentation differences; the driver compare sorts both)."""
    from flatbread.tooling import offset_date_field as ref_offs

    from flatbread_spark.operators.dates import offset_date_field

    pdf = pd.DataFrame({
        "date": pd.to_datetime([
            "2021-03-01 04:05:06", "2022-05-02 00:00:00",
            "2021-07-04 00:00:00", "2023-01-31 23:59:59",
            "2020-02-29 12:00:00",
        ]),
        "year": [2021, 2022, 2021, 2023, 2020],
        "v": [1, 2, 3, 4, 5],
    })
    ref = ref_offs(pdf, "date", "year").sort_values("v")
    ours = offset_date_field(
        spark.createDataFrame(pdf), "date", "year"
    ).toPandas().sort_values("v")
    assert list(ref["date_offs"].astype(str)) == list(ours["date_offs"].astype(str))
    assert list(ref["date"].astype(str)) == list(ours["date"].astype(str))


def test_series_adapter_matches_reference(spark):
    """Series path (§2 #18): a 1-column frame squeezed back to the Series
    shape reproduces the reference Series accessor's add_totals /
    as_percentages / add_percentages outputs exactly — including the
    single-level [n, pct] columns."""
    from flatbread.transforms.percentages import (
        add_percentages as ref_addpct,
        as_percentages as ref_aspct,
    )
    from flatbread.transforms.totals import add_totals as ref_tot

    s = pd.Series([5, 3, 8], index=pd.Index(["b", "a", "c"], name="k"), name="v")
    ff = FlatFrame.from_pandas(spark, s.to_frame()).add_totals(axis=0)

    ref_t = ref_tot(s)
    ours_t = ff.to_pandas()["v"]
    assert list(ref_t.index) == list(ours_t.index)
    assert list(ref_t) == list(ours_t)

    ref_p = ref_aspct(ref_tot(s), ndigits=2, base=100)
    ours_p = ff.as_percentages(axis=0, ndigits=2, base=100).to_pandas()["v"]
    assert list(ref_p) == list(ours_p)

    ref_a = ref_addpct(ref_tot(s), ndigits=2, base=100)
    ours_a = (
        ff.add_percentages(axis=0, label_n="n", ndigits=2, base=100)
        .squeeze_col_level(-1)
        .to_pandas()
    )
    assert_frames_equal(ref_a, ours_a)
    # squeeze refuses a non-constant level
    with pytest.raises(ValueError):
        ff.add_percentages(axis=0, ndigits=2, base=100).squeeze_col_level(0)


@given(spec=mi_frames_clean, lvlname=st.booleans(),
       axis=st.sampled_from([1, 2]))
@settings(**SET)
def test_subtotals_column_axis_matches_reference(spark, spec, lvlname, axis):
    """Column-axis (and both-axes) subtotals on a 2-level column MultiIndex
    against the live reference — the transposed-build frame exercises the
    metadata-only column path."""
    from flatbread.transforms import totals as rtot

    pdf = build_mi(spec).T  # 2-level columns, 1-level index
    # axis=2 needs a 2-level row index on our side too: lift via a 1-level
    # index frame is fine for axis=1; for axis=2 subtotal the ROW level 0
    # of a single-level index is invalid on both sides, so restrict axis=2
    # to the column-subtotal half by leveling the index
    if axis == 2:
        pdf = pd.concat({"G": pdf}, names=["outer"])
    kw = dict(axis=axis, level=0, include_level_name=lvlname)
    ref = rtot.add_subtotals(pdf, **kw)
    ours = FlatFrame.from_pandas(spark, pdf).add_subtotals(**kw).to_pandas()
    assert_frames_equal(ref, ours)


def test_rounding_mode_boundary_documented_divergence(spark):
    """Pin of the ONE known value divergence class vs the reference:
    apportioned rounding at an exact .5 boundary. The engine rounds HALF_UP
    (Spark/DuckDB convention — the driver's oracle replays it), pandas
    rounds half-to-even. 115/184*100 = 62.5 exactly: reference apportions
    to (62, 38), the engine to (63, 37) — both preserve the column sum.
    An intensive 25x(3 axes)x(3 ndigits)x(2 bases) sweep found NO other
    divergence class; ndigits=0 merely amplifies this one because integer
    grids hit .5 often."""
    from flatbread.transforms import totals as rtot
    from flatbread.transforms.percentages import as_percentages as ref_aspct

    pdf = pd.DataFrame(
        {"x": [65, 25], "y": [50, 44]}, index=pd.Index(["r0", "r1"], name="k")
    )
    t = rtot.add_totals(pdf, axis=2, label="TOT")
    kw = dict(axis=0, ndigits=0, base=100, label_totals="TOT")
    ref = ref_aspct(t, **kw)
    ours = (
        FlatFrame.from_pandas(spark, pdf)
        .add_totals(axis=2, label="TOT")
        .as_percentages(**kw)
        .to_pandas()
    )
    assert list(ref["TOT"]) == [62.0, 38.0, 100.0]   # banker's at 62.5
    assert list(ours["TOT"]) == [63.0, 37.0, 100.0]  # HALF_UP at 62.5
    # non-boundary columns agree exactly; every column sum agrees
    assert list(ref["x"]) == list(ours["x"])
    assert list(ref["y"]) == list(ours["y"])
    assert ref.sum().tolist() == ours.sum().tolist()


def test_rendered_html_attributes_match_reference(spark):
    """The HTML sink's rendered viewer attributes — a configured display
    chain on both engines — match the reference's Jinja output exactly
    (including the default margin-labels, na-rep, trim-size and the
    hide-settings-menu baseline attribute)."""
    import re

    s = pd.DataFrame(
        {"x": [1, 2], "y": [3, 4]}, index=pd.Index(["a", "b"], name="k")
    )
    acc = (
        s.pita.set_locale("nl-NL").set_max_rows(10)
        .show_hover().collapse_columns().set_no_wrap()
    )
    html_ref = acc._repr_html_()
    d = (
        FlatFrame.from_pandas(spark, s).display()
        .set_locale("nl-NL").set_max_rows(10)
        .show_hover().collapse_columns().set_no_wrap()
    )
    html_ours = d._repr_html_()

    def attrs(html):
        out = {}
        for k, v in re.findall(r'setAttribute\("([^"]+)",\s*"?([^")]*)"?\)', html):
            # the reference joins margin_labels from an unordered SET —
            # its order is hash-seed-dependent across processes (ours
            # sorts); compare that one attribute as a set of labels
            out[k] = frozenset(v.split(";")) if k == "margin-labels" else v
        return out

    assert attrs(html_ref) == attrs(html_ours)


# ---------------------------------------------------------------- tablespec
# VERDICT r5 #7: extend the divergence sweep to the display path — tablespec
# JSON byte-parity over random margined frames (reference ``get_json``,
# display.py:295 / tablespec.py:243-265, vs engine ``get_json``).


@given(spec=mi_frames_clean,
       chain=st.sampled_from(["totals0", "totals1", "totals2", "subtotals",
                              "agg_min", "agg_max"]))
@settings(**SET)
def test_tablespec_json_byte_parity_matches_reference(spark, spec, chain):
    """Random integer MultiIndex frames through a margin chain serialize to
    BYTE-IDENTICAL tablespec JSON on both engines (compact separators, key
    order, int-not-float rendering, dtype strings, formatOptions). Integer
    frames are the byte-parity domain: pandas keeps int margins for
    sum/min/max, and this engine now does too (``row_wise(integral=True)``)."""
    from flatbread.transforms import aggregation as ragg
    from flatbread.transforms import totals as rtot

    pdf = build_mi(spec)
    ours = FlatFrame.from_pandas(spark, pdf)
    if chain == "totals0":
        ref = rtot.add_totals(pdf, axis=0, label="Totals")
        ours = ours.add_totals(axis=0, label="Totals")
    elif chain == "totals1":
        ref = rtot.add_totals(pdf, axis=1, label="Totals")
        ours = ours.add_totals(axis=1, label="Totals")
    elif chain == "totals2":
        ref = rtot.add_totals(pdf, axis=2, label="Totals")
        ours = ours.add_totals(axis=2, label="Totals")
    elif chain == "subtotals":
        ref = rtot.add_subtotals(pdf, level=0, label="Sub")
        ours = ours.add_subtotals(level=0, label="Sub")
    else:
        fn = chain.split("_")[1]
        ref = ragg.add_agg(pdf, fn, axis=1, label=fn)
        ours = ours.add_agg(fn, axis=1, label=fn)
    assert ref.pita.get_json() == ours.display().get_json()


def test_tablespec_json_timestamp_corners_match_reference(spark):
    """Timestamp serializer corners are byte-identical: midnight timestamps
    trim to date-only (``tablespec.py:250-253``), intraday keep full ISO."""
    ts = pd.DataFrame(
        {
            "d": [pd.Timestamp("2024-01-05"),
                  pd.Timestamp("2024-01-05 13:30:01")],
            "v": [1, 2],
        },
        index=pd.Index(["a", "b"], name="k"),
    )
    ref = ts.pita.get_json()
    ours = FlatFrame.from_pandas(spark, ts).display().get_json()
    assert ref == ours
    assert '"2024-01-05"' in ref and '"2024-01-05T13:30:01"' in ref


def test_tablespec_nan_margins_values_match_reference(spark):
    """NaN cells are *missing* on both engines: margins skip them (pandas
    skipna == engine NaN->NULL ingestion + null-skipping sums). Byte parity
    is NOT asserted here — pinned divergence: pandas upcasts the int column
    to float during the margin concat (and serializes through the numpy
    common-dtype ``.values`` grid, tablespec.py:245-249), so the reference
    prints ``1.0``/dtype ``float`` where this engine keeps ``1``/``int``.
    Values and nullness match exactly."""
    import json as _json

    from flatbread.transforms import totals as rtot

    pdf = pd.DataFrame(
        {"x": [1, 2], "y": [3.5, float("nan")]},
        index=pd.Index(["a", "b"], name="k"),
    )
    ref = _json.loads(rtot.add_totals(pdf, label="Totals").pita.get_json())
    ours = _json.loads(
        FlatFrame.from_pandas(spark, pdf).add_totals(label="Totals")
        .display().get_json()
    )
    assert ref["values"] == [[1.0, 3.5, 4.5], [2.0, None, 2.0], [3.0, 3.5, 6.5]]
    assert [[None if v is None else float(v) for v in row]
            for row in ours["values"]] == ref["values"]
    assert ref["index"] == ours["index"]
    assert ref["columns"]["values"] == ours["columns"]["values"]
    # the pinned dtype divergence, asserted so a behavior change surfaces
    assert ref["columns"]["dtypes"] == ["float", "float", "float"]
    assert ours["columns"]["dtypes"] == ["int", "float", "float"]


def test_tablespec_interval_index_matches_reference(spark):
    """A pd.cut Interval index serializes to the same strings on both
    engines (reference: ``str(Interval)`` via the json default,
    tablespec.py:259-261; engine: index labels are strings already)."""
    binned = pd.DataFrame(
        {"n": [5, 7]},
        index=pd.cut(pd.Series([1, 8]), bins=[0, 5, 10]).astype(
            pd.CategoricalDtype(ordered=True)
        ),
    )
    binned.index.name = "bin"
    ref = binned.pita.get_json()
    ours = FlatFrame.from_pandas(spark, binned).display().get_json()
    assert _json_values(ref) == _json_values(ours)


def _json_values(s):
    import json as _json

    d = _json.loads(s)
    return d["values"], d["index"]["values"], d["columns"]["values"]


def test_pivot_nan_skipna_parity_and_pinned_empty_sum(spark):
    """NaN in the fact table is *missing* on both engines: the pivot's
    aggregates skip NaN (``nan_safe`` masks NaN->NULL before the JVM agg,
    matching pandas skipna), and margins over the pivot skip the resulting
    NULLs. ONE pinned divergence: a group whose values are ALL NaN sums to
    0.0 in pandas (``min_count=0``) but NULL here — SQL semantics, which is
    what the driver's DuckDB oracle replays (``SUM`` over all-NULL is NULL).
    Zero-row combos are missing on both engines."""
    from flatbread_spark import pivot_table

    fact_pd = pd.DataFrame(
        {
            "g": ["a", "a", "b", "b"],
            "c": ["x", "y", "x", "y"],
            "v": [1.0, float("nan"), 3.0, 4.0],
        }
    )
    ours = (
        pivot_table(spark.createDataFrame(fact_pd), index="g", columns="c",
                    values="v", aggfunc="sum")
        .add_totals(axis=2)
        .to_pandas()
    )
    ref = fact_pd.pivot_table(index="g", columns="c", values="v", aggfunc="sum")
    # data cells agree where pandas has data; the all-NaN group (a,y) is
    # 0.0 in pandas, NULL here (pinned)
    assert ours.loc["a", "x"] == ref.loc["a", "x"] == 1.0
    assert ours.loc["b", "y"] == ref.loc["b", "y"] == 4.0
    assert ref.loc["a", "y"] == 0.0
    assert pd.isna(ours.loc["a", "y"])
    # margins skip the missing cell: row total for 'a' is 1.0, not NaN
    assert ours.loc["a", "Totals"] == 1.0
    assert ours.loc["Totals", "x"] == 4.0 and ours.loc["Totals", "Totals"] == 8.0


def test_display_truncation_pinned_payload_with_trim_cue(spark):
    """Pinned scale divergence + rendered-view parity for big frames:
    the reference embeds the FULL frame in get_json/_repr_html_ and lets
    the web component trim client-side (max-rows=30, trim-size=5) — an
    unbounded payload this engine will never ship. The engine ships
    exactly the 2*trim_size head+tail rows the component would display,
    and lowers the rendered max-rows attribute below the shipped count so
    the component's separator/trim UI still engages — same pixels, bounded
    bytes. Small frames keep byte-parity (swept above) and the configured
    max-rows."""
    import json as _json
    import re

    big = pd.DataFrame(
        {"x": range(100)},
        index=pd.Index([f"r{i:03d}" for i in range(100)], name="k"),
    )
    ref_rows = _json.loads(big.pita.get_json())["values"]
    assert len(ref_rows) == 100  # reference: unbounded payload

    d = FlatFrame.from_pandas(spark, big).display()
    ours = _json.loads(d.get_json())
    assert len(ours["values"]) == 10  # head 5 + tail 5
    assert ours["index"]["values"][:5] == ["r000", "r001", "r002", "r003", "r004"]
    assert ours["index"]["values"][-5:] == ["r095", "r096", "r097", "r098", "r099"]
    html = d._repr_html_()
    attrs = dict(re.findall(r'setAttribute\("([^"]+)",\s*"?([^")]*)"?\)', html))
    assert attrs["max-rows"] == "9"      # < shipped 10 -> trim UI engages
    assert attrs["trim-size"] == "5" and attrs["separator"] == "..."

    small = FlatFrame.from_pandas(
        spark, pd.DataFrame({"x": [1, 2]}, index=pd.Index(["a", "b"], name="k"))
    ).display()
    h2 = small._repr_html_()
    a2 = dict(re.findall(r'setAttribute\("([^"]+)",\s*"?([^")]*)"?\)', h2))
    assert a2["max-rows"] == "30" and not small.builder.truncated


def _half_up_apportioned(s, *, ndigits: int = -1):
    """The reference's round_apportioned with HALF_UP in place of pandas
    banker's rounding — the ENGINE's documented rounding model (see the
    62.5 scalar pin above). Percent cumsums are non-negative, so HALF_UP
    is exactly floor(x·scale + 0.5)/scale."""
    if ndigits < 0:
        return s
    scale = 10.0 ** ndigits
    cumsum = (s.fillna(0).cumsum() * scale + 0.5).apply(np.floor) / scale
    prev_baseline = cumsum.shift(1).fillna(0)
    rounded = cumsum - prev_baseline
    return rounded.mask(s.isna())


@given(
    nan_at=st.sets(st.integers(0, 5), max_size=3),
    axis=st.sampled_from([0, 1, 2]),
    nd=st.sampled_from([0, 1]),
)
@settings(**SET)
def test_nan_margin_chain_matches_reference(spark, nan_at, axis, nd):
    """Random NaN positions through the full margin chain
    (add_totals(axis=2) -> as_percentages with apportioned rounding):
    NaN is missing on both engines — skipped by sums, NaN/NULL pct cells
    align. The engine is compared EXACTLY against the reference chain run
    under the engine's documented HALF_UP rounding model (the 62.5 scalar
    pin above generalized); the live banker's-rounding reference may then
    differ from that model only at exact-.5 cumsum boundaries, by at most
    one grid step per cell — both assertions below, so a real
    apportionment bug cannot hide inside the divergence class."""
    import flatbread.transforms.percentages as rpct
    from flatbread.transforms import totals as rtot
    from flatbread.transforms.percentages import as_percentages as ref_aspct

    vals = [10.0, 20.0, 30.0, 5.0, 25.0, 15.0]
    for i in nan_at:
        vals[i] = float("nan")
    pdf = pd.DataFrame(
        {"x": vals[:3], "y": vals[3:]},
        index=pd.Index(["a", "b", "c"], name="k"),
    )
    if pdf.sum().min() == 0 or pdf.sum(axis=1).min() == 0:
        return  # all-NaN row/col: pinned 0.0-vs-NULL divergence, tested above
    with_tot = rtot.add_totals(pdf, axis=2, label="TOT")
    ref = ref_aspct(
        with_tot, axis=axis, ndigits=nd, base=100, label_totals="TOT",
    )
    # the same reference chain under the engine's HALF_UP rounding model
    orig = rpct.round_apportioned
    rpct.round_apportioned = _half_up_apportioned
    try:
        ref_hu = ref_aspct(
            with_tot, axis=axis, ndigits=nd, base=100, label_totals="TOT",
        )
    finally:
        rpct.round_apportioned = orig
    ours = (
        FlatFrame.from_pandas(spark, pdf).add_totals(axis=2, label="TOT")
        .as_percentages(axis=axis, ndigits=nd, base=100)
        .to_pandas()
    )
    assert list(ref.index) == list(ours.index)
    assert list(ref.columns) == list(ours.columns)
    # STRICT: the engine must equal the HALF_UP reference model cell-
    # for-cell (float-vs-decimal cumsum tolerance only)
    assert np.allclose(
        ref_hu.values.astype(float), ours.values.astype(float),
        atol=GRID_ATOL, equal_nan=True,
    )
    # and the live reference may differ from the model only by one grid
    # step (banker's vs HALF_UP at an exact .5 — the pinned divergence)
    diff = np.abs(ref.values.astype(float) - ref_hu.values.astype(float))
    assert np.nanmax(np.where(np.isnan(diff), 0.0, diff)) <= 10.0 ** (-nd) + 1e-9
