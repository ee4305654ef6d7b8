"""`flatbread_spark.testing.make_test_frame` — the user-facing fixture
factory, graded directly against the reference's `make_test_df`
(`/root/reference/flatbread/testing/dataframe.py:5-162`): same knobs, same
label grammar, same values; then one margin property sweep driven BY the
factory on both sides (the reference's own test strategy, SURVEY §5)."""
import sys

import pytest

REF = "/root/reference"
if REF not in sys.path:  # live oracle, read-only
    sys.path.insert(0, REF)

try:
    from flatbread.testing.dataframe import make_test_df
except Exception:  # pragma: no cover — no reference checkout
    make_test_df = None

pytestmark = pytest.mark.skipif(
    make_test_df is None, reason="reference library not importable"
)

from flatbread_spark.testing import make_test_frame  # noqa: E402

SHAPES = [
    dict(nrows=3, ncols=2),
    dict(nrows=4, ncols=3, idx_dupes=[2], idx_names=["Year", "Quarter"]),
    dict(nrows=4, ncols=3, idx_dupes=[2, 1], idx_names=["Year", "Quarter"]),
    dict(nrows=6, ncols=4, idx_levels=3, idx_dupes=[2, 1]),
    dict(nrows=12, ncols=2),  # 2-digit labels: insertion order != lexical
    dict(nrows=5, ncols=6, col_dupes=[3], col_names=["grp", "item"]),
    dict(nrows=4, ncols=4, idx_dupes=[2], col_dupes=[2],
         idx_prefix="X", col_prefix="Y"),
    dict(nrows=3, ncols=3, idx_names=False, col_names=False),
]


@pytest.mark.parametrize("kw", SHAPES, ids=[str(i) for i in range(len(SHAPES))])
def test_factory_matches_reference_structure(spark, kw):
    ref = make_test_df(**kw)
    ours = make_test_frame(spark, **kw).to_pandas()
    assert list(ref.columns) == list(ours.columns)
    assert list(ref.index) == list(ours.index)
    # names: parity except idx_names=False, where Spark still needs physical
    # column names but the display metadata is unnamed — matching pandas'
    # unnamed-index rendering
    assert list(ref.columns.names) == list(ours.columns.names)
    assert list(ref.index.names) == list(ours.index.names)
    assert ref.astype(str).values.tolist() == ours.astype(str).values.tolist()


def test_factory_data_gen_and_dtype(spark):
    ref = make_test_df(3, 2, data_gen_f=lambda r, c: (r + 1) * (c + 1), dtype=float)
    ours = make_test_frame(
        spark, 3, 2, data_gen_f=lambda r, c: (r + 1) * (c + 1), dtype="double"
    ).to_pandas()
    assert ref.values.tolist() == ours.values.tolist()
    assert all(str(dt) == "float64" for dt in ours.dtypes)


def test_factory_validates_like_reference(spark):
    with pytest.raises(ValueError, match="duplicates cannot be longer"):
        make_test_frame(spark, 4, 2, idx_levels=1, idx_dupes=[2, 2])
    with pytest.raises(ValueError, match="duplicates cannot be longer"):
        make_test_df(4, 2, idx_levels=1, idx_dupes=[2, 2])


@pytest.mark.parametrize(
    "kw",
    [
        dict(nrows=4, ncols=3, idx_dupes=[2]),
        dict(nrows=6, ncols=4, idx_dupes=[3], col_dupes=[2]),
        dict(nrows=9, ncols=2, idx_levels=2, idx_dupes=[3]),
    ],
)
def test_factory_frames_drive_margins_to_reference_parity(spark, kw):
    """The point of the factory: parameterized frames feeding the margin
    pipeline identically on both engines."""
    import numpy as np
    from flatbread.transforms import totals as rtot

    gen = lambda r, c: float((r + 2) * (c + 3) % 7 + 1)  # noqa: E731
    ref = rtot.add_totals(make_test_df(data_gen_f=gen, dtype=float, **kw), axis=2)
    ours = (
        make_test_frame(spark, data_gen_f=gen, dtype="double", **kw)
        .add_totals(axis=2)
        .to_pandas()
    )
    assert list(ref.index) == list(ours.index)
    assert list(ref.columns) == list(ours.columns)
    assert np.allclose(ref.values.astype(float), ours.values.astype(float))
