"""Round-6 operators: sample_weighted (A-ES), normalize_text, pmi_bigrams.

Each test checks the operator against an independent pure-Python
re-implementation of its contract (the same oracle-style discipline as
test_pipeline_ops), plus the determinism properties the module docstrings
promise (partitioning-invariance, weight-monotone inclusion).
"""
import hashlib
import math
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _py_bucket(key: str, salt: str = "") -> int:
    return int(hashlib.md5((key + salt).encode()).hexdigest()[:15], 16) % 1_000_000


def _py_priority(key: str, weight: float, salt: str = "") -> float:
    u = (_py_bucket(key, salt) + 0.5) / 1_000_000
    return math.log(u) / weight


# ------------------------------------------------------------ sample_weighted
class TestSampleWeighted:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k string, grp string, w double")

    def test_matches_pure_python_aes(self, spark):
        from flatbread_spark.operators.sampling import sample_weighted

        rows = [(f"k{i}", "g", float(1 + i % 7)) for i in range(200)]
        got = {
            r["k"]
            for r in sample_weighted(self._df(spark, rows), "k", "w", 25).collect()
        }
        pri = sorted(rows, key=lambda r: (-_py_priority(r[0], r[2]), r[0]))
        want = {r[0] for r in pri[:25]}
        assert got == want

    def test_partitioning_invariant(self, spark):
        from flatbread_spark.operators.sampling import sample_weighted

        rows = [(f"doc{i}", "g", float((i * 37) % 11 + 1)) for i in range(300)]
        df = self._df(spark, rows)
        a = {r["k"] for r in sample_weighted(df, "k", "w", 40).collect()}
        b = {
            r["k"]
            for r in sample_weighted(df.repartition(7), "k", "w", 40).collect()
        }
        assert a == b

    def test_stratified_takes_n_per_stratum(self, spark):
        from flatbread_spark.operators.sampling import sample_weighted

        rows = [(f"k{i}", f"g{i % 3}", 1.0 + i % 5) for i in range(90)]
        out = sample_weighted(
            self._df(spark, rows), "k", "w", 7, strata_col="grp"
        ).collect()
        per = Counter(r["grp"] for r in out)
        assert per == {"g0": 7, "g1": 7, "g2": 7}
        # per-stratum winners match the pure-python A-ES ranking
        for g in ("g0", "g1", "g2"):
            pri = sorted(
                (r for r in rows if r[1] == g),
                key=lambda r: (-_py_priority(r[0], r[2]), r[0]),
            )
            want = {r[0] for r in pri[:7]}
            assert {r["k"] for r in out if r["grp"] == g} == want

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from flatbread_spark.operators.sampling import sample_weighted

        df = spark.createDataFrame(
            [("a", "g", 1.0), ("b", "g", 0.0), ("c", "g", -2.0), ("d", "g", None)],
            "k string, grp string, w double",
        )
        out = sample_weighted(df, "k", "w", 10).collect()
        assert {r["k"] for r in out} == {"a"}

    def test_weight_tilt_is_directional(self, spark):
        # one heavy key vs many light ones: the heavy key must be sampled
        # (P ~ 1 - eps with weight ratio 1000), light-only sample would
        # indicate the priority sign/direction is flipped
        from flatbread_spark.operators.sampling import sample_weighted

        rows = [("heavy", "g", 1000.0)] + [
            (f"light{i}", "g", 1.0) for i in range(100)
        ]
        out = {r["k"] for r in sample_weighted(self._df(spark, rows), "k", "w", 20).collect()}
        assert "heavy" in out

    def test_salt_decouples(self, spark):
        from flatbread_spark.operators.sampling import sample_weighted

        rows = [(f"k{i}", "g", 1.0) for i in range(400)]
        df = self._df(spark, rows)
        a = {r["k"] for r in sample_weighted(df, "k", "w", 50, salt="s1").collect()}
        b = {r["k"] for r in sample_weighted(df, "k", "w", 50, salt="s2").collect()}
        assert a != b  # 400 choose 50 twice colliding ~ impossible

    def test_rejects_nonpositive_n(self, spark):
        from flatbread_spark.operators.sampling import sample_weighted

        with pytest.raises(ValueError):
            sample_weighted(self._df(spark, [("a", "g", 1.0)]), "k", "w", 0)


# ------------------------------------------------------------- normalize_text
class TestNormalizeText:
    def _norm(self, spark, s):
        from flatbread_spark.functions.text import normalize_text

        df = spark.createDataFrame([(s,)], "t string")
        return df.select(normalize_text(F.col("t")).alias("o")).first()["o"]

    def test_unicode_spaces_collapse(self, spark):
        assert self._norm(spark, "a   b　c") == "a b c"

    def test_controls_and_zero_widths_dropped(self, spark):
        assert self._norm(spark, "a\x00\x01b​c﻿d\x7fe") == "abcde"

    def test_crlf_becomes_lf_and_line_edges_trim(self, spark):
        assert self._norm(spark, "a \r\n  b\t\r\nc") == "a\nb\nc"

    def test_outer_whitespace_trimmed(self, spark):
        assert self._norm(spark, "\n\n  hello world \n") == "hello world"

    def test_blank_lines_preserved(self, spark):
        # paragraph structure survives: inner \n\n stays
        assert self._norm(spark, "p1\n\np2") == "p1\n\np2"

    def test_soft_hyphen_dropped(self, spark):
        assert self._norm(spark, "co­operate") == "cooperate"

    def test_idempotent(self, spark):
        once = self._norm(spark, " a  b \r\n\tc​ ")
        assert self._norm(spark, once) == once

    def test_clean_text_untouched(self, spark, documents):
        from flatbread_spark.functions.text import normalize_text

        n = (
            documents.select(
                (F.col("text") == normalize_text(F.col("text"))).alias("same")
            )
            .filter(~F.col("same"))
            .count()
        )
        assert n == 0  # synthetic corpus is already clean ASCII


# --------------------------------------------------------------- pmi_bigrams
def _py_pmi(texts, min_count, top_n):
    uni, big = Counter(), Counter()
    n_uni = n_big = 0
    for t in texts:
        ws = t.strip().split()
        if not ws:
            continue
        uni.update(ws)
        n_uni += len(ws)
        pairs = list(zip(ws, ws[1:]))
        big.update(pairs)
        n_big += len(pairs)
    out = []
    for (a, b), c in big.items():
        if c < min_count:
            continue
        pmi = math.log2(c * n_uni * n_uni / (n_big * uni[a] * uni[b]))
        out.append((a, b, c, round(pmi, 6)))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:top_n]


class TestPmiBigrams:
    def test_matches_pure_python(self, spark):
        from flatbread_spark.operators.lm import pmi_bigrams

        texts = [
            "hong kong is big",
            "hong kong hong kong",
            "new york and hong kong",
            "the cat sat on the mat",
            "the cat and the dog",
            "a b a b a b",
            "single",
            "  ",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            (r["w1"], r["w2"], r["c_ab"], r["pmi"])
            for r in pmi_bigrams(df, "text", min_count=2, top_n=10).collect()
        ]
        assert got == _py_pmi([t for t in texts if t.strip()], 2, 10)

    def test_collocation_beats_chance_pair(self, spark):
        from flatbread_spark.operators.lm import pmi_bigrams

        # "hong kong" always adjacent; "the cat" co-occur but also apart
        texts = ["hong kong"] * 5 + ["the cat", "cat the", "the dog the cat"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows = {(r["w1"], r["w2"]): r["pmi"] for r in
                pmi_bigrams(df, "text", min_count=2, top_n=10).collect()}
        assert rows[("hong", "kong")] > rows[("the", "cat")]

    def test_on_documents_deterministic(self, spark, documents):
        from flatbread_spark.operators.lm import pmi_bigrams

        a = pmi_bigrams(documents, "text", min_count=5, top_n=20).collect()
        b = pmi_bigrams(
            documents.repartition(5), "text", min_count=5, top_n=20
        ).collect()
        assert a == b and len(a) == 20


# ----------------------------------------------------- approx_topk (Misra-Gries)
class TestApproxTopk:
    def _corpus(self, spark, seed=7, n_docs=300):
        import random

        rnd = random.Random(seed)
        heavy = [f"hot{i}" for i in range(10)]
        docs = []
        for d in range(n_docs):
            ws = [rnd.choice(heavy) for _ in range(rnd.randrange(5, 15))]
            ws += [f"rare{d}_{j}" for j in range(rnd.randrange(0, 8))]
            rnd.shuffle(ws)
            docs.append((d, " ".join(ws)))
        return docs, spark.createDataFrame(docs, "doc_id int, text string")

    def _exact_topk(self, docs, k):
        c = Counter()
        for _, t in docs:
            c.update(t.lower().split())
        return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def test_matches_exact_topk(self, spark):
        from flatbread_spark.operators.sketches import approx_topk_tokens

        docs, df = self._corpus(spark)
        got = [
            (r["token"], r["n"])
            for r in approx_topk_tokens(df, "text", k=10, width=64).collect()
        ]
        assert got == self._exact_topk(docs, 10)

    def test_partitioning_invariant(self, spark):
        from flatbread_spark.operators.sketches import approx_topk_tokens

        _, df = self._corpus(spark, seed=13)
        a = approx_topk_tokens(df, "text", k=10, width=64).collect()
        b = approx_topk_tokens(df.repartition(6), "text", k=10, width=64).collect()
        assert a == b

    def test_rejects_bad_params(self, spark):
        from flatbread_spark.operators.sketches import approx_topk_tokens

        _, df = self._corpus(spark)
        with pytest.raises(ValueError):
            approx_topk_tokens(df, "text", k=0)
        with pytest.raises(ValueError):
            approx_topk_tokens(df, "text", k=10, width=10)

    def test_mg_guarantee_pure_python(self):
        # every token with count > N/(width+1) must survive the summary,
        # across adversarial batch splits
        import random

        from flatbread_spark.operators.sketches import _mg_merge

        rnd = random.Random(42)
        stream = (
            ["big"] * 500
            + ["mid"] * 120
            + [f"noise{i}" for i in range(3000)]
        )
        rnd.shuffle(stream)
        width = 50
        for n_batches in (1, 7, 40):
            counts = {}
            size = len(stream) // n_batches + 1
            for i in range(0, len(stream), size):
                batch = pd.Series(stream[i:i + size])
                _mg_merge(counts, batch.value_counts(), width)
            n = len(stream)
            for tok, true_c in (("big", 500), ("mid", 120)):
                if true_c > n / (width + 1):
                    assert tok in counts, (tok, n_batches)


# --------------------------------------- normalize_text randomized cross-check
def _py_normalize(s):
    import re

    from flatbread_spark.functions.text import _NORM_DROP, _NORM_TO_SPACE

    t = "".join(
        " " if ch in _NORM_TO_SPACE else "" if ch in _NORM_DROP else ch
        for ch in s
    )
    t = re.sub(" +", " ", t)
    t = re.sub(" ?\n ?", "\n", t)
    return t.strip(" \n")


def test_normalize_matches_python_on_random_soup(spark):
    """200 seeded-random strings over a palette mixing letters, spaces,
    newlines and every junk char class — Spark chain must equal the
    pure-Python reference byte-for-byte (one Spark job for all cases)."""
    import random

    from flatbread_spark.functions.text import (
        _NORM_DROP,
        _NORM_TO_SPACE,
        normalize_text,
    )

    rnd = random.Random(99)
    palette = list("abXY ,.") + ["\n"] + list(_NORM_TO_SPACE) + list(_NORM_DROP)
    cases = [
        "".join(rnd.choice(palette) for _ in range(rnd.randrange(0, 60)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, t string")
    got = {
        r["i"]: r["o"]
        for r in df.select("i", normalize_text(F.col("t")).alias("o")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _py_normalize(c), (i, repr(c))


# ------------------------------------------------------- chunk_self_dedup
def _py_chunk_self_dedup(text, w=12):
    ws = text.split(" ")
    chunks = [" ".join(ws[i * w:(i + 1) * w]) for i in range(-(-len(ws) // w))]
    kept, seen = [], set()
    for c in chunks:
        if c not in seen:
            seen.add(c)
            kept.append(c)
    return len(chunks), len(kept), " ".join(kept)


class TestChunkSelfDedup:
    def test_matches_pure_python(self, spark):
        import hashlib

        from flatbread_spark.operators.dedup import chunk_self_dedup

        docs = [
            (1, "a b c d a b c d a b c d"),      # w=4: three identical chunks
            (2, "x y z w p q r s x y z w"),       # first == third chunk
            (3, "one two three"),                  # single short chunk
            (4, "a b c d e f g h"),                # no repeats
            (5, ""),                               # empty text
        ]
        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_md5"])
            for r in chunk_self_dedup(df, "doc_id", "text", words_per_chunk=4).collect()
        }
        for did, text in docs:
            n, k, clean = _py_chunk_self_dedup(text, 4)
            md5 = hashlib.md5(clean.encode()).hexdigest()
            assert got[did] == (n, k, md5), (did, got[did], (n, k, md5))

    def test_boilerplate_removed_keeps_first(self, spark):
        from flatbread_spark.operators.dedup import chunk_self_dedup

        # a "page" whose nav chunk repeats at top and bottom
        nav = " ".join(f"nav{i}" for i in range(4))
        body = " ".join(f"w{i}" for i in range(8))
        df = spark.createDataFrame(
            [(1, f"{nav} {body} {nav}")], "doc_id int, text string"
        )
        r = chunk_self_dedup(df, "doc_id", "text", words_per_chunk=4).first()
        assert (r["n_chunks"], r["n_kept"]) == (4, 3)

    def test_rejects_bad_width(self, spark):
        from flatbread_spark.operators.dedup import chunk_self_dedup

        df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError):
            chunk_self_dedup(df, "doc_id", "text", words_per_chunk=0)


# ---------------------------------------------------------------- PCA family
def _py_cov12(vecs, ndigits=9):
    """Pure-Python replay of the 12-decimal-moment covariance contract."""
    from decimal import Decimal

    d = len(vecs[0])
    n = len(vecs)

    def r12(t):
        s = t * 10**12
        return int(math.copysign(math.floor(abs(s) + 0.5), s))

    sxy = [[0] * d for _ in range(d)]
    sx = [0] * d
    for v in vecs:
        v = [float(x) for x in v]
        for i in range(d):
            sx[i] += r12(v[i])
            for j in range(d):
                sxy[i][j] += r12(v[i] * v[j])
    out = {}
    for i in range(d):
        for j in range(d):
            exy = float(Decimal(sxy[i][j]).scaleb(-12)) / n
            mi = float(Decimal(sx[i]).scaleb(-12)) / n
            mj = float(Decimal(sx[j]).scaleb(-12)) / n
            out[(i, j)] = round(exy - mi * mj, ndigits)
    return out


class TestPca:
    def test_covariance_matches_pure_python(self, spark):
        import random

        from flatbread_spark.operators.pca import covariance_matrix

        rnd = random.Random(5)
        vecs = [[rnd.uniform(-2, 2) for _ in range(6)] for _ in range(120)]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "id int, v array<float>",
        )
        got = {
            (r["i"], r["j"]): r["cov"]
            for r in covariance_matrix(df, "v", 6).collect()
        }
        # reference replays from the FLOAT32-narrowed values Spark stores
        import numpy as np

        narrowed = [list(np.asarray(v, dtype=np.float32)) for v in vecs]
        want = _py_cov12(narrowed)
        assert got == want

    def test_covariance_partitioning_invariant(self, spark, embeddings):
        from flatbread_spark.operators.pca import covariance_matrix

        a = sorted(
            covariance_matrix(embeddings, "embedding", 64).collect(),
            key=lambda r: (r["i"], r["j"]),
        )
        b = sorted(
            covariance_matrix(
                embeddings.repartition(7), "embedding", 64
            ).collect(),
            key=lambda r: (r["i"], r["j"]),
        )
        assert a == b

    def test_null_and_ragged_vectors_excluded(self, spark):
        from flatbread_spark.operators.pca import covariance_matrix

        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, None), (3, [1.0]), (4, [3.0, 4.0])],
            "id int, v array<float>",
        )
        got = {
            (r["i"], r["j"]): r["cov"]
            for r in covariance_matrix(df, "v", 2).collect()
        }
        want = _py_cov12([[1.0, 2.0], [3.0, 4.0]])
        assert got == want

    def test_train_project_recovers_planted_axes(self, spark):
        import random

        import numpy as np

        from flatbread_spark.operators.pca import pca_project, pca_train

        # variance concentrated on two planted orthogonal directions
        rnd = np.random.RandomState(11)
        d = 8
        a = np.zeros(d); a[0] = 1.0
        b = np.zeros(d); b[3] = 1.0
        X = (
            rnd.normal(0, 5, (400, 1)) * a
            + rnd.normal(0, 2, (400, 1)) * b
            + rnd.normal(0, 0.05, (400, d))
        )
        df = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(X)],
            "id int, v array<float>",
        )
        comp, ev = pca_train(df, "v", d, 2)
        assert abs(comp[0][0]) > 0.99 and abs(comp[1][3]) > 0.99
        assert ev[0] > ev[1] > 0
        proj = pca_project(df, "v", comp).orderBy("id").collect()
        assert len(proj) == 400 and len(proj[0]["pca"]) == 2
        # projection equals the numpy matmul on float32-narrowed input
        X32 = np.stack([np.asarray(r, dtype=np.float32) for r in X.tolist()])
        want = X32.astype(np.float64) @ comp.T
        got = np.array([r["pca"] for r in proj])
        assert np.allclose(got, want, atol=1e-9)

    def test_project_null_propagates(self, spark):
        import numpy as np

        from flatbread_spark.operators.pca import pca_project

        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, None), (3, [1.0])],
            "id int, v array<float>",
        )
        comp = np.eye(2)
        got = {r["id"]: r["pca"] for r in pca_project(df, "v", comp).collect()}
        assert got[1] == [1.0, 2.0] and got[2] is None and got[3] is None


def test_embedding_mean_matches_numpy(spark, embeddings):
    import numpy as np

    from flatbread_spark.operators.pca import embedding_mean

    mu = embedding_mean(embeddings, "embedding", 64)
    X = np.stack([
        np.asarray(r["embedding"], dtype=np.float32)
        for r in embeddings.collect()
    ]).astype(np.float64)
    # 12-decimal element rounding → within 5e-13 per element of the raw mean
    assert np.allclose(mu, X.mean(axis=0), atol=1e-9)
    # and partition-order independent
    mu2 = embedding_mean(embeddings.repartition(5), "embedding", 64)
    assert (mu == mu2).all()


# ------------------------------------------------- mine_contrastive_negatives
def _py_h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestContrastiveNegatives:
    def test_rand_picks_match_hash_math(self, spark, embeddings):
        from flatbread_spark.operators.similarity import (
            mine_contrastive_negatives,
        )

        anchors = embeddings.filter(F.col("vec_id") < 20)
        out = mine_contrastive_negatives(
            embeddings, anchors, k_hard=2, n_rand=2, salt="t", n_buckets=16
        ).collect()
        ids = [r["vec_id"] for r in embeddings.select("vec_id").collect()]
        buckets = {i: _py_h60(str(i)) % 16 for i in ids}
        got_rand = {}
        for r in out:
            if r["kind"] == "rand":
                got_rand.setdefault(r["anchor_id"], set()).add(r["other_id"])
                assert r["cos"] is None
        for a in range(20):
            want = set()
            for j in range(2):
                bj = _py_h60(f"{a}|{j}|t") % 16
                members = [i for i in ids if buckets[i] == bj and i != a]
                if members:
                    want.add(min(members, key=lambda c: (_py_h60(f"{c}#{a}#{j}#t"), c)))
            assert got_rand.get(a, set()) == want, a

    def test_hard_counts_and_partition_invariance(self, spark, embeddings):
        from flatbread_spark.operators.similarity import (
            mine_contrastive_negatives,
        )

        anchors = embeddings.filter(F.col("vec_id") < 10)
        a = mine_contrastive_negatives(embeddings, anchors, k_hard=3, n_rand=1)
        rows = a.collect()
        hard = [r for r in rows if r["kind"] == "hard"]
        assert len(hard) == 10 * 3
        assert all(r["cos"] is not None and r["anchor_id"] != r["other_id"]
                   for r in hard)
        b = mine_contrastive_negatives(
            embeddings.repartition(7), anchors, k_hard=3, n_rand=1
        ).collect()
        key = lambda r: (r["anchor_id"], r["kind"], r["other_id"])
        assert sorted(map(key, rows)) == sorted(map(key, b))

    def test_rejects_bad_params(self, spark, embeddings):
        from flatbread_spark.operators.similarity import (
            mine_contrastive_negatives,
        )

        with pytest.raises(ValueError):
            mine_contrastive_negatives(embeddings, k_hard=0)
