"""Vectorized trigram-score kernel parity (round 11, guide §4.2).

make_trigram_score_udf's n<=3 path packs each n-gram's codepoints into one
int64 (21-bit fields — exact, collision-free) and scores with np.unique +
searchsorted instead of a per-row Python Counter loop. These tests pin the
vectorized path byte-identical to the pure-Python scorer
(_tri_score_row_py, the old implementation) across adversarial unicode,
model shapes, and the n>3 fallback — the engine's sum_freq/n_tris/
distinct_tris feed a driver-graded query, so any divergence is a
correctness bug, not a perf bug.
"""
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flatbread_spark.functions._arrow_kernels import (
    _tri_score_row_py,
    make_trigram_score_udf,
)

# astral plane + BMP + ASCII: exercises the full 21-bit packing range
ALPHA = "ab 12é中\U0001f600\U0010fffd\n"


def _vec_fn(model, n=3):
    # the pandas_udf wrapper exposes the original function as .func
    return make_trigram_score_udf(model, n).func


def _apply(fn, rows):
    texts = pd.Series([t for t, _ in rows], dtype=object)
    langs = pd.Series([l for _, l in rows], dtype=object)
    out = fn(texts, langs)
    return list(zip(out["n_tris"], out["distinct_tris"], out["sum_freq"]))


def _expected(model, rows, n=3):
    g = model.get
    exp = []
    for t, lang in rows:
        if t is None or len(t) < n:
            exp.append((0, 0, 0))
        else:
            exp.append(_tri_score_row_py(t, lang, g, n))
    return exp


texts_st = st.one_of(st.none(), st.text(alphabet=ALPHA, max_size=40))
langs_st = st.sampled_from([None, "en", "zh", "xx"])


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(st.tuples(texts_st, langs_st), max_size=12),
    model_texts=st.lists(st.text(alphabet=ALPHA, min_size=3, max_size=10),
                         max_size=6),
    counts=st.lists(st.integers(min_value=1, max_value=10**12), min_size=6,
                    max_size=6),
)
def test_vectorized_matches_python(spark, rows, model_texts, counts):
    # model trigrams drawn from the same alphabet so hits actually occur
    model = {}
    for i, mt in enumerate(model_texts):
        for j in range(len(mt) - 2):
            model[("en" if i % 2 == 0 else "zh", mt[j : j + 3])] = counts[
                (i + j) % len(counts)
            ]
    # a NULL-lang model entry must match nothing (SQL join semantics)
    model[(None, "abc")] = 999
    got = _apply(_vec_fn(model), rows)
    assert [tuple(int(x) for x in r) for r in got] == _expected(model, rows)


def test_edge_rows_and_empty_model(spark):
    model = {}
    rows = [(None, "en"), ("", "en"), ("ab", "en"), ("abc", None),
            ("abc", "en"), ("\U0001f600\U0001f600\U0001f600", "en")]
    got = _apply(_vec_fn(model), rows)
    assert [tuple(int(x) for x in r) for r in got] == _expected(model, rows)


def test_hits_with_astral_codepoints_and_big_counts(spark):
    # exact packing at the top of the codepoint range, counts near the
    # practical corpus ceiling — the integer dot product must stay exact
    tri = "\U0010fffd\U0010fffd\U0010fffd"
    model = {("en", tri): 10**15, ("en", "abc"): 7}
    rows = [(tri + tri, "en"), ("abcabc", "en")]
    got = _apply(_vec_fn(model), rows)
    assert [tuple(int(x) for x in r) for r in got] == _expected(model, rows)


def test_n4_fallback_is_python_path(spark):
    model = {("en", "abcd"): 5}
    rows = [("abcde", "en"), ("abc", "en")]
    got = _apply(make_trigram_score_udf(model, 4).func, rows)
    assert [tuple(int(x) for x in r) for r in got] == _expected(model, rows, 4)


def _extract_maps(fn, texts):
    out = fn(pd.Series(texts, dtype=object))
    return [dict(zip(t, (int(x) for x in k)))
            for t, k in zip(out["tris"], out["ks"])]


def _extract_expected(texts, n=3):
    from collections import Counter

    exp = []
    for t in texts:
        if t is None or len(t) < n:
            exp.append({})
        else:
            exp.append(dict(Counter(t[i : i + n]
                                    for i in range(len(t) - n + 1))))
    return exp


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(st.one_of(st.none(),
                                st.text(alphabet=ALPHA, max_size=40)),
                      max_size=12))
def test_extract_kernel_matches_counter(spark, texts):
    # order is unobservable (the only consumer explodes + re-aggregates),
    # so parity is on the (tri -> k) MAP per row
    from flatbread_spark.functions._arrow_kernels import (
        make_trigram_extract_udf,
    )

    got = _extract_maps(make_trigram_extract_udf(3).func, texts)
    assert got == _extract_expected(texts)


def test_extract_kernel_surrogate_and_n4(spark):
    from flatbread_spark.functions._arrow_kernels import (
        make_trigram_extract_udf,
    )

    texts = ["ab\ud800cd", "abcabc", None, "ab"]
    got = _extract_maps(make_trigram_extract_udf(3).func, texts)
    assert got == _extract_expected(texts)
    got4 = _extract_maps(make_trigram_extract_udf(4).func, texts)
    assert got4 == _extract_expected(texts, 4)


def test_lone_surrogate_falls_back_rowwise(spark):
    # impossible from parquet, possible from hand-built frames: the
    # vectorized path must not crash the task, it must score identically
    s = "ab\ud800cd"
    with pytest.raises(UnicodeEncodeError):
        s.encode("utf-32-le")
    model = {("en", "ab\ud800"): 3}
    rows = [(s, "en"), ("abc", "en")]
    got = _apply(_vec_fn(model), rows)
    assert [tuple(int(x) for x in r) for r in got] == _expected(model, rows)
