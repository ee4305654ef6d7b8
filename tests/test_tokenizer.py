"""Tokenizer-induction and character-statistics operators
(flatbread_spark/operators/tokenizer.py) against hand-computed references."""
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from flatbread_spark.operators.tokenizer import (
    char_entropy,
    mix_temperature,
    pair_counts,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "solo"),
    (3, "a b a b a b"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def ref_pairs(texts, k):
    c = Counter()
    for t in texts:
        toks = t.strip().lower().split()
        c.update(zip(toks, toks[1:]))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(a, b, n, i + 1) for i, ((a, b), n) in enumerate(ranked)][:k]


def test_pair_counts_matches_reference(corpus):
    got = [
        (r.a, r.b, r.n, r.rank)
        for r in pair_counts(corpus, "text", top_k=5).orderBy("rank").collect()
    ]
    assert got == ref_pairs([t for _, t in CORPUS], 5)
    # the BPE merge-selection invariant: rank 1 is the most frequent pair
    assert got[0][:3] == ("a", "b", 3)


def test_pair_counts_single_token_doc_contributes_nothing(spark):
    df = spark.createDataFrame([(0, "one")], "doc_id bigint, text string")
    assert pair_counts(df, "text").count() == 0


def test_char_entropy_matches_reference(corpus):
    rows = {r.doc_id: r for r in char_entropy(corpus, "doc_id", "text").collect()}
    for doc_id, text in CORPUS:
        c = Counter(text)
        n = sum(c.values())
        h = math.log2(n) - sum(
            round(v * math.log2(v), 9) for v in c.values()
        ) / n
        assert rows[doc_id].n_chars == n
        assert rows[doc_id].entropy == pytest.approx(round(h, 6), abs=1e-6)
    # uniform two-symbol alternation ("a b a b a b" over {a,b,space}) has
    # higher entropy than the single-word doc
    assert rows[3].entropy > rows[2].entropy


def test_mix_temperature_properties(spark):
    df = spark.createDataFrame(
        [("big", 900), ("small", 100)], "source string, tok int"
    )
    nat = {
        r.source: r
        for r in mix_temperature(df, "source", "tok", alpha=1.0).collect()
    }
    # alpha=1 is natural sampling: prob == share
    assert nat["big"].sampling_prob == pytest.approx(0.9, abs=1e-6)
    uni = {
        r.source: r
        for r in mix_temperature(df, "source", "tok", alpha=0.0).collect()
    }
    # alpha=0 is uniform
    assert uni["big"].sampling_prob == pytest.approx(0.5, abs=1e-6)
    tempered = {
        r.source: r
        for r in mix_temperature(df, "source", "tok", alpha=0.3).collect()
    }
    # 0 < alpha < 1 upsamples the small source relative to its share
    assert tempered["small"].sampling_prob > nat["small"].sampling_prob
    assert sum(r.sampling_prob for r in tempered.values()) == pytest.approx(
        1.0, abs=1e-5
    )


def test_pair_counts_plan_is_one_shuffle(corpus):
    """Pair construction must stay row-local: exactly one Exchange for the
    groupBy (plus the bounded top-k window), none for pair building."""
    plan = pair_counts(corpus, "text")._jdf.queryExecution().executedPlan().toString()
    pre_window = plan.split("Window")[-1]  # stages below the rank window
    assert pre_window.count("Exchange") <= 2  # partial-agg pair + final agg
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def ref_bpe_train(texts, n_merges):
    """Pure-Python reference BPE trainer (greedy left-to-right apply,
    lexicographic tie-break)."""
    seqs = [t.strip().lower().split() for t in texts]
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for s in seqs:
            c.update(zip(s, s[1:]))
        if not c:
            break
        (a, b), n = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b, n))
        joined = a + " " + b
        for si, s in enumerate(seqs):
            i, out = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[si] = out
    return merges


def test_bpe_train_matches_reference(corpus):
    from flatbread_spark.operators.tokenizer import bpe_train

    got = bpe_train(corpus, "text", n_merges=4)
    assert got == ref_bpe_train([t for _, t in CORPUS], 4)
    # first merge must be the most frequent pair of the raw corpus
    assert got[0][:2] == ("a", "b")
    # later merges can consume earlier merged symbols ("a b" as one symbol)
    assert all(n >= 1 for _, _, n in got)


def test_apply_merges_greedy_nonoverlapping(spark):
    from flatbread_spark.operators.tokenizer import apply_merges

    df = spark.createDataFrame([(0, "x x x x x")], "doc_id bigint, text string")
    out = apply_merges(df, "text", [("x", "x")]).select("__symbols").first()[0]
    # greedy left-to-right: pairs consume non-overlapping occurrences
    assert out == ["x x", "x x", "x"]
