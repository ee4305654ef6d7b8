"""Round-7 operators: chunk_windows (RAG windowing), hashed linear
classifier, bloom membership, vocabulary coverage.

Same discipline as test_round6_ops: each operator is checked against an
independent pure-Python re-implementation of its contract, plus the
determinism / plan properties its module docstring promises.
"""
import hashlib
import re

import pytest
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_chunks(doc_id, text, window, stride, min_words=1):
    words = re.split(r"\s+", text.strip())
    n = len(words)
    nc = 1 if n <= window else (n - window + stride - 1) // stride + 1
    out = []
    for i in range(nc):
        start = i * stride
        piece = words[start : start + window]
        if len(piece) >= min_words:
            out.append(
                (
                    doc_id,
                    i,
                    start,
                    len(piece),
                    _h60(f"{doc_id}:{i}"),
                    " ".join(piece),
                )
            )
    return out


# -------------------------------------------------------------- chunk_windows
class TestChunkWindows:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_matches_pure_python(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        rows = [
            (i, " ".join(f"w{i}_{j}" for j in range((i * 13) % 40 + 1)))
            for i in range(30)
        ]
        got = {
            tuple(r)
            for r in chunk_windows(
                self._df(spark, rows), "doc_id", "text", 8, 5
            ).collect()
        }
        want = {
            t for (doc_id, text) in rows for t in _py_chunks(doc_id, text, 8, 5)
        }
        assert got == want

    def test_full_coverage_and_overlap(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        text = " ".join(f"t{j}" for j in range(100))
        out = chunk_windows(
            self._df(spark, [(1, text)]), "doc_id", "text", 16, 12
        ).collect()
        covered = set()
        for r in out:
            covered.update(range(r["start_word"], r["start_word"] + r["n_chunk_words"]))
        assert covered == set(range(100))
        # consecutive windows overlap by window - stride
        starts = sorted(r["start_word"] for r in out)
        assert all(b - a == 12 for a, b in zip(starts, starts[1:]))

    def test_min_chunk_words_drops_runt(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        text = " ".join(f"t{j}" for j in range(21))  # windows: 0-15, 12-20(9)
        df = self._df(spark, [(1, text)])
        assert chunk_windows(df, "doc_id", "text", 16, 12).count() == 2
        assert (
            chunk_windows(df, "doc_id", "text", 16, 12, min_chunk_words=10).count()
            == 1
        )

    def test_keep_text_false_drops_string(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        out = chunk_windows(
            self._df(spark, [(1, "a b c")]), "doc_id", "text", 2, 1, keep_text=False
        )
        assert "chunk_text" not in out.columns

    def test_invalid_params_raise(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        df = self._df(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            chunk_windows(df, "doc_id", "text", 4, 5)
        with pytest.raises(ValueError):
            chunk_windows(df, "doc_id", "text", 0, 0)

    def test_zero_shuffle_plan(self, spark):
        from flatbread_spark.operators.chunking import chunk_windows

        df = self._df(spark, [(1, "a b c d e")])
        plan = chunk_windows(df, "doc_id", "text", 2, 1)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


# ---------------------------------------------------------- hashed classifier
def _py_bucket_n(s: str, n: int, salt: str = "") -> int:
    return _h60(salt + s) % n


def _py_weight(b: int) -> int:
    return _h60(f"w#{b}") % 2001 - 1000


def _py_feats(text: str, n: int, salt: str = "", bigrams: bool = True):
    words = re.split(r"\s+", text.strip().lower())
    feats = [_py_bucket_n(w, n, salt) for w in words]
    if bigrams:
        feats += [
            _py_bucket_n(f"{a} {b}", n, salt) for a, b in zip(words, words[1:])
        ]
    return feats


class TestHashedClassifier:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_pseudo_weights_match_pure_python(self, spark):
        from flatbread_spark.operators.classifier import score_hashed_linear

        rows = [
            (1, "The quick Brown fox"),
            (2, "hello"),
            (3, "a b c d e f"),
            (4, "  spaced   out  tokens "),
        ]
        out = score_hashed_linear(
            self._df(spark, rows), "doc_id", "text", n_buckets=4096, salt="qc#"
        )
        got = {r["doc_id"]: (r["n_feats"], r["logit"], r["keep"]) for r in out.collect()}
        for i, t in rows:
            feats = _py_feats(t, 4096, "qc#")
            logit = sum(_py_weight(b) for b in feats)
            assert got[i] == (len(feats), logit, logit > 0)

    def test_unigrams_only(self, spark):
        from flatbread_spark.operators.classifier import score_hashed_linear

        out = score_hashed_linear(
            self._df(spark, [(1, "x y z")]), "doc_id", "text",
            n_buckets=512, salt="s", include_bigrams=False,
        ).collect()[0]
        feats = _py_feats("x y z", 512, "s", bigrams=False)
        assert out["n_feats"] == 3
        assert out["logit"] == sum(_py_weight(b) for b in feats)

    def test_supplied_weights_left_join_semantics(self, spark):
        from flatbread_spark.operators.classifier import score_hashed_linear

        rows = [(1, "alpha beta"), (2, "gamma")]
        n = 256
        feats1 = _py_feats("alpha beta", n)
        wdf = spark.createDataFrame(
            [(int(feats1[0]), 2.5)], "bucket bigint, weight double"
        )
        out = {
            r["doc_id"]: (r["logit"], r["keep"])
            for r in score_hashed_linear(
                self._df(spark, rows), "doc_id", "text",
                weights=wdf, n_buckets=n, threshold=1.0,
            ).collect()
        }
        expect1 = 2.5 * feats1.count(feats1[0])
        assert out[1] == (expect1, expect1 > 1.0)
        assert out[2] == (0.0, False)  # no bucket in model -> scores 0

    def test_pseudo_path_zero_shuffle_weights_path_broadcasts(self, spark):
        from flatbread_spark.operators.classifier import score_hashed_linear

        df = self._df(spark, [(1, "a b")])
        p1 = score_hashed_linear(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p1
        wdf = spark.createDataFrame([(0, 1.0)], "bucket bigint, weight double")
        p2 = score_hashed_linear(df, "doc_id", "text", weights=wdf)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p2

    def test_append_matches_select_path_and_keeps_columns(self, spark):
        # round 9: append=True is the single-pass gate-stacking hook — same
        # three score columns as the select path, all input columns kept.
        from flatbread_spark.operators.classifier import score_hashed_linear

        rows = [(1, "The quick Brown fox", "x"), (2, "hello", "y"),
                (3, "a b c d e f", "z")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, extra string")
        base = {
            r["doc_id"]: (r["n_feats"], r["logit"], r["keep"])
            for r in score_hashed_linear(
                df, "doc_id", "text", n_buckets=4096, salt="qc#"
            ).collect()
        }
        app = score_hashed_linear(
            df, "doc_id", "text", n_buckets=4096, salt="qc#", append=True
        )
        assert set(app.columns) == {"doc_id", "text", "extra", "n_feats", "logit", "keep"}
        got = {
            r["doc_id"]: ((r["n_feats"], r["logit"], r["keep"]), r["extra"])
            for r in app.collect()
        }
        for i, _, extra in rows:
            assert got[i] == (base[i], extra)
        # demo-weights append stays a zero-shuffle expression chain
        plan = app._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_append_with_supplied_weights_joins_back(self, spark):
        from flatbread_spark.operators.classifier import score_hashed_linear

        rows = [(1, "alpha beta", "k1"), (2, "gamma", "k2")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, extra string")
        n = 256
        feats1 = _py_feats("alpha beta", n)
        wdf = spark.createDataFrame(
            [(int(feats1[0]), 2.5)], "bucket bigint, weight double"
        )
        out = {
            r["doc_id"]: (r["logit"], r["keep"], r["extra"])
            for r in score_hashed_linear(
                df, "doc_id", "text", weights=wdf, n_buckets=n,
                threshold=1.0, append=True,
            ).collect()
        }
        expect1 = 2.5 * feats1.count(feats1[0])
        assert out[1] == (expect1, expect1 > 1.0, "k1")
        assert out[2] == (0.0, False, "k2")


# ------------------------------------------------------------ bloom membership
class TestBloom:
    M, K = 1 << 12, 3

    def _py_probes(self, key):
        return [_h60(f"bl#{key}#{i}") % self.M for i in range(self.K)]

    def _py_words(self, keys):
        words = {}
        for key in keys:
            for p in self._py_probes(key):
                words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
        return words

    def test_no_false_negatives_and_python_parity(self, spark):
        from flatbread_spark.operators.bloom import bloom_build, bloom_check

        corpus_keys = [f"key{i}" for i in range(200)]
        batch_keys = [f"key{i}" for i in range(150, 400)]
        corpus = spark.createDataFrame([(x,) for x in corpus_keys], "k string")
        batch = spark.createDataFrame([(x,) for x in batch_keys], "k string")
        bl = bloom_build(corpus, "k", self.M, self.K)
        assert bl.count() <= self.M // 32
        got = {
            r["k"]: r["maybe_present"]
            for r in bloom_check(batch, "k", bl, self.M, self.K).collect()
        }
        # no false negatives
        assert all(got[x] for x in batch_keys if x in set(corpus_keys))
        # bit-exact parity with the pure-Python filter (incl. any FPs)
        words = self._py_words(corpus_keys)
        for x in batch_keys:
            want = all(
                (words.get(p // 32, 0) >> (p % 32)) & 1 for p in self._py_probes(x)
            )
            assert got[x] == want

    def test_filter_novel_drops_all_corpus_rows(self, spark):
        from flatbread_spark.operators.bloom import bloom_build, bloom_filter_novel

        corpus = spark.createDataFrame([(f"c{i}",) for i in range(100)], "k string")
        batch = spark.createDataFrame(
            [(f"c{i}",) for i in range(100)] + [(f"n{i}",) for i in range(100)],
            "k string",
        )
        bl = bloom_build(corpus, "k", self.M, self.K)
        kept = {r["k"] for r in bloom_filter_novel(batch, "k", bl, self.M, self.K).collect()}
        assert not any(x.startswith("c") for x in kept)  # never keeps a member
        words = self._py_words([f"c{i}" for i in range(100)])
        expected = {
            f"n{i}"
            for i in range(100)
            if not all(
                (words.get(p // 32, 0) >> (p % 32)) & 1
                for p in self._py_probes(f"n{i}")
            )
        }
        assert kept == expected

    def test_invalid_params_raise(self, spark):
        from flatbread_spark.operators.bloom import bloom_build

        df = spark.createDataFrame([("a",)], "k string")
        with pytest.raises(ValueError):
            bloom_build(df, "k", m_bits=100)  # not a multiple of 32
        with pytest.raises(ValueError):
            bloom_build(df, "k", m_bits=64, k=0)

    def test_check_broadcasts_bloom(self, spark):
        from flatbread_spark.operators.bloom import bloom_build, bloom_check

        df = spark.createDataFrame([("a",)], "k string")
        bl = bloom_build(df, "k", self.M, self.K)
        plan = bloom_check(df, "k", bl, self.M, self.K)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------- vocab coverage
class TestVocabCoverage:
    def _rows(self):
        return [
            (i, " ".join(f"w{(i * j) % 17}" for j in range(1, (i % 9) + 3)))
            for i in range(40)
        ]

    def _py(self, rows, vset):
        out = {}
        for i, t in rows:
            ws = re.split(r"\s+", t.strip().lower())
            hit = sum(w in vset for w in ws)
            out[i] = (len(ws), hit, len(ws) - hit)
        return out

    def test_top_vocab_deterministic_cut(self, spark):
        from collections import Counter

        from flatbread_spark.operators.tokenizer import top_vocab

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        cnt = Counter(
            w for _, t in rows for w in re.split(r"\s+", t.strip().lower())
        )
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
        got = [(r["token"], r["n"]) for r in top_vocab(df, "text", 6).collect()]
        assert got == want

    def test_join_and_scan_methods_agree_with_python(self, spark):
        from flatbread_spark.operators.tokenizer import top_vocab, vocab_coverage

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        vt = top_vocab(df, "text", 6)
        vset = {r["token"] for r in vt.collect()}
        want = self._py(rows, vset)
        for method in ("join", "scan"):
            got = {
                r["doc_id"]: (r["n_tokens"], r["n_in_vocab"], r["n_oov"])
                for r in vocab_coverage(
                    df, "doc_id", "text", vt, method=method
                ).collect()
            }
            assert got == want, method

    def test_duplicate_vocab_rows_do_not_double_count(self, spark):
        from flatbread_spark.operators.tokenizer import vocab_coverage

        df = spark.createDataFrame([(1, "a a b")], "doc_id bigint, text string")
        vocab = spark.createDataFrame([("a",), ("a",)], "token string")
        r = vocab_coverage(df, "doc_id", "text", vocab).collect()[0]
        assert (r["n_tokens"], r["n_in_vocab"], r["n_oov"]) == (3, 2, 1)

    def test_unknown_method_raises(self, spark):
        from flatbread_spark.operators.tokenizer import vocab_coverage

        df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        with pytest.raises(ValueError):
            vocab_coverage(df, "doc_id", "text", df.select(F.lit("a").alias("token")), method="nope")

    def test_scan_method_zero_shuffle_after_vocab(self, spark):
        from flatbread_spark.operators.tokenizer import vocab_coverage

        df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
        vocab = spark.createDataFrame([("a",)], "token string")
        plan = vocab_coverage(df, "doc_id", "text", vocab, method="scan")._jdf.queryExecution().executedPlan().toString()
        # the doc-side scan joins only against the broadcast 1-row vocab array
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ----------------------------------------------------------- hot ngram spans
def _py_coverage(rows, n, min_count):
    from collections import Counter

    toks = {i: re.split(r"\s+", t.strip().lower()) for i, t in rows}
    occ = Counter()
    for ws in toks.values():
        for s in range(len(ws) - n + 1):
            occ[" ".join(ws[s : s + n])] += 1
    hot = {g for g, c in occ.items() if c >= min_count}
    out = {}
    for i, ws in toks.items():
        starts = [
            s for s in range(len(ws) - n + 1) if " ".join(ws[s : s + n]) in hot
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, s + n))
        out[i] = (len(ws), len(covered), len(starts), covered)
    return out


class TestHotNgramSpans:
    def _rows(self):
        boiler = "all rights reserved see license for details"
        uniq = lambda i: " ".join(f"u{i}_{j}" for j in range(6))
        rows = [(i, f"{uniq(i)} {boiler} tail{i}") for i in range(5)]
        rows.append((90, "totally unrelated short text"))
        rows.append((91, "xx yy"))  # shorter than n
        return rows

    def test_coverage_matches_pure_python(self, spark):
        from flatbread_spark.operators.spans import hot_ngram_coverage

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_covered"], r["n_hot_occ"])
            for r in hot_ngram_coverage(df, "doc_id", "text", n=3, min_count=3).collect()
        }
        want = {
            i: (nt, nc, nh) for i, (nt, nc, nh, _) in _py_coverage(rows, 3, 3).items()
        }
        assert got == want
        # the planted boilerplate is detected in every carrier document
        assert all(got[i][1] >= 7 for i in range(5))
        assert got[90] == (4, 0, 0)

    def test_mask_removes_exactly_covered_tokens(self, spark):
        from flatbread_spark.operators.spans import mask_hot_ngrams

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: r["masked_text"]
            for r in mask_hot_ngrams(df, "doc_id", "text", n=3, min_count=3).collect()
        }
        py = _py_coverage(rows, 3, 3)
        for i, t in rows:
            ws = re.split(r"\s+", t.strip().lower())
            keep = [w for p, w in enumerate(ws) if p not in py[i][3]]
            assert got[i] == " ".join(keep), i

    def test_precomputed_hot_set_reused(self, spark):
        from flatbread_spark.operators.spans import (
            hot_ngram_coverage, hot_ngram_hashes,
        )

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        hot = hot_ngram_hashes(df, "text", n=3, min_count=3)
        batch = df.filter(F.col("doc_id") < 2)
        got = {
            r["doc_id"]: (r["n_covered"], r["n_hot_occ"])
            for r in hot_ngram_coverage(
                batch, "doc_id", "text", n=3, hot=hot
            ).collect()
        }
        py = _py_coverage(rows, 3, 3)
        assert got == {i: (py[i][1], py[i][2]) for i in (0, 1)}

    def test_hot_join_broadcasts(self, spark):
        from flatbread_spark.operators.spans import hot_ngram_coverage

        df = spark.createDataFrame(self._rows(), "doc_id bigint, text string")
        plan = hot_ngram_coverage(df, "doc_id", "text", n=3, min_count=3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------------ strip_html
class TestStripHtml:
    def _strip(self, spark, raw):
        from flatbread_spark.functions.text import strip_html

        df = spark.createDataFrame([(raw,)], "t string")
        return df.select(strip_html(F.col("t")).alias("s")).collect()[0]["s"]

    def test_blocks_tags_entities(self, spark):
        raw = (
            '<html><head><script>var x="<b>";</script><style>p{}</style>'
            "</head><body><!-- c --><p>Hello &amp; welcome</p> "
            "<b>to</b> the &lt;real&gt; world&#39;s &quot;best&quot;&nbsp;page"
            "</body></html>"
        )
        assert (
            self._strip(spark, raw)
            == 'Hello & welcome to the <real> world\'s "best" page'
        )

    def test_decode_order_amp_last(self, spark):
        # &amp;lt; must become &lt; (literal), never < — decode can't cascade
        assert self._strip(spark, "a &amp;lt; b") == "a &lt; b"

    def test_out_of_list_entity_kept(self, spark):
        assert self._strip(spark, "x &copy; y") == "x &copy; y"

    def test_multiline_script_and_comment(self, spark):
        raw = "a<script>\nline1\nline2\n</script>b<!--\nmulti\n-->c"
        assert self._strip(spark, raw) == "a b c"

    def test_plain_text_unchanged(self, spark):
        assert self._strip(spark, "no markup here") == "no markup here"

    def test_with_stripped_html_in_place(self, spark):
        from flatbread_spark.functions.text import with_stripped_html

        df = spark.createDataFrame([(1, "<p>x</p>")], "i bigint, text string")
        assert with_stripped_html(df, "text").collect()[0]["text"] == "x"


# ------------------------------------------------------------- robust outliers
class TestRobustOutlierGate:
    def test_median_mad_flags(self, spark):
        from flatbread_spark.operators.curation import robust_outlier_gate

        rows = [("en", i) for i in [10, 11, 12, 12, 13, 14, 100]] + [
            ("de", j) for j in [5, 5, 5, 5, 50]
        ]
        df = spark.createDataFrame(rows, "lang string, v bigint")
        out = robust_outlier_gate(df, "lang", "v", 3.0).collect()
        en = {r["v"]: (r["med"], r["mad"], r["is_outlier"]) for r in out if r["lang"] == "en"}
        de = {r["v"]: (r["med"], r["mad"], r["is_outlier"]) for r in out if r["lang"] == "de"}
        assert en[12] == (12.0, 1.0, False) and en[100] == (12.0, 1.0, True)
        # MAD=0 degenerate group: any deviation from the median flags
        assert de[5] == (5.0, 0.0, False) and de[50] == (5.0, 0.0, True)

    def test_interpolated_median_half_granularity(self, spark):
        from flatbread_spark.operators.curation import robust_outlier_gate

        df = spark.createDataFrame(
            [("g", v) for v in [10, 11, 13, 14]], "lang string, v bigint"
        )
        r = robust_outlier_gate(df, "lang", "v").collect()[0]
        assert r["med"] == 12.0 and r["mad"] == 1.5

    def test_stats_joins_broadcast(self, spark):
        from flatbread_spark.operators.curation import robust_outlier_gate

        df = spark.createDataFrame([("g", 1)], "lang string, v bigint")
        plan = robust_outlier_gate(df, "lang", "v")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
