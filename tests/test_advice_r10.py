"""Round-10 ADVICE regression pins (one test per adjudicated r9 finding).

- pmi_bigrams must NOT cache the unfiltered bigram count table (its type
  tail is corpus-sized at open-web scale — SCALE.md's pin rule says
  recompute corpus-sized frames, pin vocabulary-sized ones). The ``n_big``
  total is derived by identity instead (n_uni − n_docs), value-identical
  to the direct Σc_ab — pinned both by the plan (exactly one InMemory
  relation: the unigram table) and by value against a pure-Python oracle
  on a corpus where blank/whitespace docs make the identity easy to get
  wrong;
- pca_train collects and returns numpy arrays, so the moment aggregate
  covariance_matrix pins must NOT outlive the call — unpinned by handle
  (not tag), so a sibling lazy covariance_matrix pin survives;
- the four pin-side-effect operators' PUBLIC docstrings must name the
  cache and the release route (fuzzy_match_pairs / canonicalize_names /
  robust_outlier_gate / join_estimate) — source-sync pinned so a doc
  regression fails here.
"""
import collections
import inspect
import math

import pytest
from pyspark.sql import functions as F


# --- finding 1 (low): pmi_bigrams' unfiltered bigram table un-pinned -----


def _pmi_oracle(texts, min_count, top_n):
    """Pure-Python PMI over whitespace tokens, blank/null docs dropped."""
    uni = collections.Counter()
    big = collections.Counter()
    for t in texts:
        if t is None or not t.strip():
            continue
        toks = t.strip().split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n_uni = sum(uni.values())
    n_big = sum(big.values())
    rows = []
    for (w1, w2), c_ab in big.items():
        if c_ab < min_count:
            continue
        pmi = round(
            math.log2(c_ab * n_uni * n_uni / (n_big * uni[w1] * uni[w2])), 6
        )
        rows.append((w1, w2, c_ab, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_n], n_big


def test_pmi_caches_only_the_unigram_table(spark):
    """Plan pin: exactly ONE InMemoryTableScan lineage feeds the PMI plan
    (the vocabulary-sized unigram table). The old form also persisted the
    UNFILTERED bigram table — corpus-tailed storage for what is now an
    identity (n_big = n_uni − n_docs)."""
    from flatbread_spark import release_caches
    from flatbread_spark.cache import pinned_tags
    from flatbread_spark.operators.lm import pmi_bigrams

    df = spark.createDataFrame(
        [("a b a b",), ("a b c",), ("  ",), (None,), ("c",)], ["text"]
    )
    try:
        out = pmi_bigrams(df, "text", min_count=1, top_n=10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one pinned frame total, and it is under the lm tag
        assert pinned_tags().count("lm") == 1
        assert "InMemoryTableScan" in plan
    finally:
        release_caches("lm")


def test_pmi_n_big_identity_with_blank_and_singleton_docs(spark):
    """Value pin for the identity n_big = n_uni − n_docs: blank and
    whitespace-only docs contribute NOTHING to n_docs (they are filtered
    before tokenizing), and 1-token docs contribute a token but no pair —
    the two cases that would skew a miscounted identity. Graded against
    the pure-Python oracle."""
    from flatbread_spark import release_caches
    from flatbread_spark.operators.lm import pmi_bigrams

    texts = [
        "x y x y x y",
        "x y z",
        "z",          # 1 token: +1 n_uni, +1 n_docs, 0 pairs
        "",           # blank: excluded entirely
        "   ",        # whitespace-only: excluded entirely
        None,         # null: excluded entirely
        "y x",
    ]
    want, want_n_big = _pmi_oracle(texts, min_count=1, top_n=20)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    try:
        got = [
            (r["w1"], r["w2"], r["c_ab"], r["pmi"])
            for r in pmi_bigrams(df, "text", min_count=1, top_n=20).collect()
        ]
    finally:
        release_caches("lm")
    assert got == want
    # the oracle's n_big equals the identity the operator now uses
    n_uni = sum(len(t.strip().split()) for t in texts if t and t.strip())
    n_docs = sum(1 for t in texts if t and t.strip())
    assert want_n_big == n_uni - n_docs


# --- finding 2 (low): pca_train releases its moment cache ----------------


def test_pca_train_leaves_no_pinned_frame(spark):
    """pca_train returns numpy arrays — nothing lazy outlives the call —
    so the dim² moment aggregate must be unpersisted before it returns,
    not parked until a manual release_caches('pca')."""
    from flatbread_spark.cache import pinned_tags
    from flatbread_spark.operators.pca import pca_train

    df = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],), ([1.0, 1.0],), ([2.0, 0.5],)],
        ["emb"],
    )
    before = pinned_tags().count("pca")
    comp, var = pca_train(df, "emb", dim=2, k=1)
    assert comp.shape == (1, 2) and var.shape == (1,)
    assert pinned_tags().count("pca") == before, (
        "pca_train leaked a pinned moment frame"
    )


def test_pca_train_releases_by_handle_not_tag(spark):
    """A sibling covariance_matrix whose LAZY result is still unread must
    keep its pin when pca_train releases its own — by-handle unpin, not
    release_caches('pca')."""
    from flatbread_spark import release_caches
    from flatbread_spark.cache import pinned_tags
    from flatbread_spark.operators.pca import covariance_matrix, pca_train

    df = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],), ([1.0, 1.0],)], ["emb"]
    )
    try:
        lazy = covariance_matrix(df, "emb", dim=2)  # pins, unread
        assert pinned_tags().count("pca") == 1
        pca_train(df, "emb", dim=2, k=1)
        assert pinned_tags().count("pca") == 1, (
            "pca_train's release dropped a sibling's live pin"
        )
        # the sibling's cache is still valid — materialize through it
        assert len(lazy.collect()) == 4
    finally:
        release_caches("pca")


def test_unpin_unknown_frame_is_a_noop(spark):
    from flatbread_spark.cache import unpin

    assert unpin(spark.range(1)) is False


# --- finding 3 (low): pin side effects documented at the public surface --


@pytest.mark.parametrize(
    "func_path, tag",
    [
        ("flatbread_spark.operators.linkage.fuzzy_match_pairs", "linkage"),
        ("flatbread_spark.operators.linkage.canonicalize_names", "linkage"),
        ("flatbread_spark.operators.curation.robust_outlier_gate", "curation"),
        ("flatbread_spark.operators.skew.join_estimate", "skew"),
        ("flatbread_spark.operators.lm.pmi_bigrams", "lm"),
        ("flatbread_spark.operators.pca.covariance_matrix", "pca"),
    ],
)
def test_pin_side_effect_documented(func_path, tag):
    """Every operator that persists as a side effect says so in its OWN
    docstring, naming cache.pin and the release_caches tag."""
    mod_path, name = func_path.rsplit(".", 1)
    mod = __import__(mod_path, fromlist=[name])
    doc = inspect.getdoc(getattr(mod, name))
    assert "cache.pin" in doc, f"{name}: pin side effect undocumented"
    assert f'release_caches("{tag}")' in doc, (
        f"{name}: release route for tag {tag!r} undocumented"
    )
