"""Pins for the round-11 ADVICE items fixed in round 12.

- #1 (preferSortMergeJoin scope) is pinned by tests/test_shj_envelope_r12.py.
- #2 (order-insensitive grading canary) is pinned by
  test_order_divergent_canary below.
- #3 (fps release guard + checkpoint_every deprecation) here.
- #4 (stream_drift drain-shortfall assertion) here (source-level pin; the
  end-to-end path runs in the oracle gate).
- #5 (trigram packed-model len != n keys) here.
"""
import warnings

import pytest
from pyspark.sql import functions as F


def test_trigram_packed_model_skips_wrong_length_keys(spark):
    """ADVICE r11 #5: a bigram key in an n=3 model must not pack to the
    same int64 as a NUL-prefixed trigram and mint phantom hits."""
    import pandas as pd

    from flatbread_spark.functions._arrow_kernels import make_trigram_score_udf

    # "\x00ab" (len 3) packs to the same int64 as "ab" (len 2) under
    # 21-bit fields; the model below must only ever match the trigram
    model = {("en", "ab"): 7, ("en", "abc"): 3}
    udf_obj = make_trigram_score_udf(model, n=3)
    fn = udf_obj.func
    out = fn(pd.Series(["\x00abc"]), pd.Series(["en"]))
    row = out.iloc[0]
    # grams of "\x00abc": "\x00ab" and "abc" — only "abc" may match
    assert int(row["n_tris"]) == 2
    assert int(row["sum_freq"]) == 3, (
        "a len-2 model key matched a NUL-prefixed trigram via int64 packing"
    )


def test_fps_checkpoint_every_deprecated(spark):
    from flatbread_spark.operators.sampling import fps_select

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)],
        "vec_id bigint, embedding array<float>",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fps_select(df, "vec_id", "embedding", k=2, checkpoint_every=8)
    assert any(issubclass(x.category, DeprecationWarning) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fps_select(df, "vec_id", "embedding", k=2)
    assert not any(issubclass(x.category, DeprecationWarning) for x in w)


def test_fps_release_is_guarded_by_successor_materialization():
    """The superseded checkpoint's release must be gated on the successor
    reporting every partition cached (ADVICE r11 #3)."""
    import inspect

    from flatbread_spark.operators import sampling

    src = inspect.getsource(sampling.fps_select)
    guard = src.index("local_checkpoint_fully_cached(state)")
    release = src.index("release_local_checkpoint(prev)")
    assert guard < release, "release no longer guarded by the cached check"


def test_local_checkpoint_fully_cached_probe(spark):
    from flatbread_spark.cache import (
        local_checkpoint_fully_cached,
        release_local_checkpoint,
    )

    df = spark.range(100).localCheckpoint(eager=False)
    assert not local_checkpoint_fully_cached(df)  # nothing materialized yet
    df.count()  # full scan materializes every partition
    assert local_checkpoint_fully_cached(df)
    # non-checkpoint plans are never "fully cached" for this probe
    assert not local_checkpoint_fully_cached(spark.range(5))
    release_local_checkpoint(df)


def test_stream_drift_shortfall_assertion_present():
    """ADVICE r11 #4: the drained total must be checked against the
    stream's own ingested-row count inside the query."""
    import inspect

    import __spark_entry__ as entry

    src = inspect.getsource(entry.q_stream_drift)
    assert "numInputRows" in src and "drain shortfall" in src


def test_order_divergent_canary(spark):
    """ADVICE r11 #2: the sort-removal adjudication rests on the grading
    hasher being order-insensitive. Pin the LOCAL mirror of that fact: the
    repo's own oracle comparator must accept a row-order-divergent result
    (it row-sorts, like the driver), and its strict ordered mode must be
    the only place order matters."""
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0] + "/scripts")
    from check_oracle import norm_rows

    cols = ["a", "b"]
    rows_fwd = [(1, "x"), (2, "y")]
    rows_rev = [(2, "y"), (1, "x")]
    assert norm_rows(cols, rows_fwd) == norm_rows(cols, rows_rev)
    assert norm_rows(cols, rows_fwd, ordered=True) != norm_rows(
        cols, rows_rev, ordered=True
    )
