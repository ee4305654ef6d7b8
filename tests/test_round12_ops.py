"""Round-12 operators: exact nearest-rank percentiles, boilerplate-prefix
stripping, n-gram novelty, int8-quantized knn. Each checked against an
independent pure-Python re-derivation of its documented formula."""
import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------- exact_percentiles
class TestExactPercentiles:
    def test_nearest_rank_formula(self, spark):
        from flatbread_spark.operators.ranking import exact_percentiles

        vals = [(i, (i * 37) % 101) for i in range(103)]
        df = spark.createDataFrame(vals, "id bigint, v bigint")
        qs = [10_000, 250_000, 500_000, 750_000, 990_000, 1_000_000]
        got = {
            r["q_ppm"]: (r["pos"], r["n"], r["v"])
            for r in exact_percentiles(df, "v", "id", qs).collect()
        }
        ordered = sorted(vals, key=lambda r: (r[1], r[0]))
        n = len(ordered)
        for q in qs:
            pos = max(1, (q * n + 999_999) // 1_000_000)
            assert got[q] == (pos, n, ordered[pos - 1][1]), q

    def test_median_of_even(self, spark):
        from flatbread_spark.operators.ranking import exact_percentiles

        df = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (4, 40)], "id bigint, v bigint"
        )
        [r] = exact_percentiles(df, "v", "id", [500_000]).collect()
        # nearest-rank median of 4 = element at ceil(0.5*4)=2
        assert (r["pos"], r["v"]) == (2, 20)

    def test_rejects_bad_q(self, spark):
        from flatbread_spark.operators.ranking import exact_percentiles

        df = spark.createDataFrame([(1, 1)], "id bigint, v bigint")
        with pytest.raises(ValueError):
            exact_percentiles(df, "v", "id", [0])
        with pytest.raises(ValueError):
            exact_percentiles(df, "v", "id", [1_000_001])


# ----------------------------------------------------- strip_boilerplate_prefix
class TestBoilerplate:
    PREFIX = "SUBSCRIBE TO OUR NEWSLETTER | COOKIE OK | "  # 42 chars

    def _df(self, spark):
        rows = []
        for i in range(20):
            body = f"unique article body number {i} with words " * 3
            text = (self.PREFIX + body) if i % 2 == 0 else body
            rows.append((i, "siteA" if i < 16 else "siteB", text))
        return spark.createDataFrame(rows, "doc_id bigint, src string, text string")

    def test_strips_only_flagged_groups(self, spark):
        from flatbread_spark.operators.boilerplate import strip_boilerplate_prefix

        out = strip_boilerplate_prefix(
            self._df(spark), "src", "text", prefix_len=len(self.PREFIX), min_docs=3
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        for i in range(20):
            r = by_id[i]
            if i % 2 == 0 and i < 16:  # siteA has 8 prefixed docs >= min_docs
                assert r["is_boilerplate"] is True
                assert not r["clean_text"].startswith(self.PREFIX)
                assert r["clean_text"].startswith("unique article body")
            else:  # siteB has only 2 prefixed docs: below min_docs, kept
                assert r["is_boilerplate"] is False
                assert r["clean_text"] == r["text"]

    def test_short_docs_exempt(self, spark):
        from flatbread_spark.operators.boilerplate import strip_boilerplate_prefix

        # every doc IS the shared prefix — shorter than prefix_len+1, exempt
        df = spark.createDataFrame(
            [(i, "s", "same text") for i in range(10)],
            "doc_id bigint, src string, text string",
        )
        out = strip_boilerplate_prefix(df, "src", "text", 20, 3).collect()
        assert all(r["is_boilerplate"] is False for r in out)
        assert all(r["clean_text"] == "same text" for r in out)

    def test_rejects_bad_params(self, spark):
        from flatbread_spark.operators.boilerplate import boilerplate_prefixes

        df = spark.createDataFrame([(1, "s", "t")], "id bigint, src string, text string")
        with pytest.raises(ValueError):
            boilerplate_prefixes(df, "src", "text", prefix_len=0)
        with pytest.raises(ValueError):
            boilerplate_prefixes(df, "src", "text", min_docs=1)


# ------------------------------------------------------------- ngram_novelty
class TestNgramNovelty:
    def test_counts_match_python(self, spark):
        from flatbread_spark.operators.spans import ngram_novelty

        texts = {
            1: "a b c d e f",      # shares "a b c" start with doc 2
            2: "a b c x y z",
            3: "p q r s t u",      # fully unique
            4: "a b",              # too short for n=3: omitted
        }
        df = spark.createDataFrame(
            list(texts.items()), "doc_id bigint, text string"
        )
        out = {r["doc_id"]: r for r in ngram_novelty(df, "doc_id", "text", n=3).collect()}

        def grams(t):
            w = t.split()
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

        from collections import Counter

        gc = Counter(g for i in (1, 2, 3) for g in grams(texts[i]))
        assert set(out) == {1, 2, 3}
        for i in (1, 2, 3):
            gs = grams(texts[i])
            uniq = sum(1 for g in gs if gc[g] == 1)
            r = out[i]
            assert (r["n_grams"], r["n_unique"]) == (len(gs), uniq)
            assert r["novelty_ppm"] == uniq * 1_000_000 // len(gs)

    def test_within_doc_repeat_counts_once(self, spark):
        from flatbread_spark.operators.spans import ngram_novelty

        # "a b c" occurs twice inside doc 1 but in no other doc -> unique
        df = spark.createDataFrame(
            [(1, "a b c d a b c"), (2, "x y z w")],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in ngram_novelty(df, "doc_id", "text", n=3).collect()}
        assert out[1]["n_unique"] == out[1]["n_grams"]  # all distinct grams unique
        assert out[1]["novelty_ppm"] == 1_000_000


# ------------------------------------------------------------- knn_quantized
class TestKnnQuantized:
    def test_matches_python_reference(self, spark, embeddings):
        import math

        from flatbread_spark.operators.similarity import knn_quantized

        corpus = embeddings.limit(80)
        queries = corpus.filter(F.col("vec_id") < 3)
        out = knn_quantized(corpus, queries, k=5, shortlist=20).collect()

        rows = corpus.collect()
        vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

        def codes(v):
            s = max(abs(x) for x in v) / 127.0
            if s <= 0:
                return [0] * len(v)
            return [math.floor(x / s + 0.5) for x in v]

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(r)
        for qid in (0, 1, 2):
            qc = codes(vecs[qid])
            scored = sorted(
                (
                    (-sum(x * y for x, y in zip(qc, codes(v))), nid)
                    for nid, v in vecs.items()
                    if nid != qid
                ),
            )[:20]
            short = {nid for _, nid in scored}
            top = sorted(
                ((-round(cos(vecs[qid], vecs[nid]), 6), nid) for nid in short)
            )[:5]
            want = [nid for _, nid in top]
            rs = sorted(got[qid], key=lambda r: r["rank"])
            assert [r["neighbor_id"] for r in rs] == want, qid
            # qdot is the exact integer dot of codes
            for r in rs:
                qd = sum(x * y for x, y in zip(qc, codes(vecs[r["neighbor_id"]])))
                assert r["qdot"] == qd

    def test_rejects_small_shortlist(self, spark, embeddings):
        from flatbread_spark.operators.similarity import knn_quantized

        with pytest.raises(ValueError):
            knn_quantized(embeddings, embeddings, k=10, shortlist=5)


# -------------------------------------------------------------- sample_to_mix
class TestSampleToMix:
    def _df(self, spark):
        rows = [(i, ["en", "de", "fr"][i % 3] if i < 90 else "zh") for i in range(100)]
        return spark.createDataFrame(rows, "doc_id bigint, lang string")

    def test_exact_mix_and_determinism(self, spark):
        from flatbread_spark.operators.sampling import sample_to_mix

        df = self._df(spark)
        targets = {"en": 600_000, "de": 200_000, "fr": 200_000}
        out = sample_to_mix(df, "doc_id", "lang", targets, salt="x").collect()
        from collections import Counter

        got = Counter(r["lang"] for r in out)
        # en has 30 rows -> M = 30*1e6//600000 = 50; keep en=30, de=10, fr=10
        assert got == {"en": 30, "de": 10, "fr": 10}
        assert not any(r["lang"] == "zh" for r in out)
        # determinism: rerun picks the same keys
        again = sample_to_mix(df, "doc_id", "lang", targets, salt="x").collect()
        assert {r["doc_id"] for r in out} == {r["doc_id"] for r in again}
        # a different salt picks a different (valid) subset of de
        other = sample_to_mix(df, "doc_id", "lang", targets, salt="y").collect()
        assert Counter(r["lang"] for r in other) == got

    def test_matches_python_hash_order(self, spark):
        import hashlib

        from flatbread_spark.operators.sampling import sample_to_mix

        df = self._df(spark)
        out = sample_to_mix(df, "doc_id", "lang", {"de": 1_000_000}, salt="s")
        got = sorted(r["doc_id"] for r in out.collect())
        # de alone: M = n_de * 1e6 // 1e6 = n_de -> keeps ALL de rows
        want = sorted(i for i in range(90) if i % 3 == 1)
        assert got == want

    def test_loud_failures(self, spark):
        from flatbread_spark.operators.sampling import sample_to_mix

        df = self._df(spark)
        with pytest.raises(ValueError):
            sample_to_mix(df, "doc_id", "lang", {})
        with pytest.raises(ValueError):
            sample_to_mix(df, "doc_id", "lang", {"en": 0})
        with pytest.raises(ValueError):
            sample_to_mix(df, "doc_id", "lang", {"en": 700_000, "de": 400_000})
        with pytest.raises(ValueError):
            sample_to_mix(df, "doc_id", "lang", {"nl": 500_000})


# --------------------------------------------------------- quantile_normalize
class TestQuantileNormalize:
    def test_matches_python_formula(self, spark):
        from flatbread_spark.operators.ranking import quantile_normalize

        # two sources with shifted score distributions
        rows = [(i, "a", 100 + (i * 7) % 50) for i in range(40)]
        rows += [(100 + i, "b", 300 + (i * 11) % 80) for i in range(60)]
        df = spark.createDataFrame(rows, "id bigint, src string, score bigint")
        out = {r["id"]: r for r in quantile_normalize(df, "src", "score", "id").collect()}

        ordered = sorted(rows, key=lambda r: (r[2], r[0]))
        n = len(ordered)
        by_src = {}
        for r in sorted(rows, key=lambda t: (t[2], t[0])):
            by_src.setdefault(r[1], []).append(r)
        for src, members in by_src.items():
            ng = len(members)
            for rank, (rid, _, _) in enumerate(members, start=1):
                ppm = (2 * rank - 1) * 1_000_000 // (2 * ng)
                gpos = max(1, (ppm * n + 999_999) // 1_000_000)
                assert out[rid]["ppm"] == ppm, rid
                assert out[rid]["norm_score"] == ordered[gpos - 1][2], rid

    def test_equalizes_shifted_sources(self, spark):
        from flatbread_spark.operators.ranking import quantile_normalize

        # same shape, source b shifted +1000: after normalization the
        # per-source medians coincide
        rows = [(i, "a", i) for i in range(50)]
        rows += [(100 + i, "b", 1000 + i) for i in range(50)]
        df = spark.createDataFrame(rows, "id bigint, src string, score bigint")
        out = quantile_normalize(df, "src", "score", "id")
        meds = {
            r["src"]: r["m"]
            for r in out.groupBy("src").agg(
                F.expr("percentile(norm_score, 0.5)").alias("m")
            ).collect()
        }
        assert meds["a"] == meds["b"]


# ----------------------------------------------------------- field_association
class TestFieldAssociation:
    def test_matches_python_contingency(self, spark):
        from collections import Counter

        from flatbread_spark.operators.skew import field_association

        rows = [(i, ["en", "de"][i % 2], f"s{i % 3}") for i in range(60)]
        rows += [(100 + i, "en", "s0") for i in range(20)]  # entangle en/s0
        df = spark.createDataFrame(rows, "id bigint, lang string, src string")
        out = {
            (r["lang"], r["src"]): r
            for r in field_association(df, "lang", "src").collect()
        }
        joint = Counter((l, s) for _, l, s in rows)
        na = Counter(l for _, l, _ in rows)
        nb = Counter(s for _, _, s in rows)
        total = len(rows)
        assert set(out) == set(joint)
        for (l, s), n in joint.items():
            r = out[(l, s)]
            assert (r["n"], r["n_a"], r["n_b"], r["total"]) == (
                n, na[l], nb[s], total,
            )
            assert r["lift_ppm"] == n * total * 1_000_000 // (na[l] * nb[s])
        # the entangled pair is overrepresented; its complement is under
        assert out[("en", "s0")]["lift_ppm"] > 1_000_000
        assert out[("de", "s0")]["lift_ppm"] < 1_000_000


# ------------------------------------------------------------------ winsorize
class TestWinsorize:
    def test_matches_python_clamp(self, spark):
        from flatbread_spark.operators.ranking import winsorize

        vals = [(i, (i * 37) % 101) for i in range(103)]
        df = spark.createDataFrame(vals, "id bigint, v bigint")
        out = {r["id"]: r["v_wins"]
               for r in winsorize(df, "v", "id", 100_000, 900_000).collect()}
        ordered = sorted(v for _, v in vals)
        n = len(ordered)
        lo = ordered[max(1, (100_000 * n + 999_999) // 1_000_000) - 1]
        hi = ordered[max(1, (900_000 * n + 999_999) // 1_000_000) - 1]
        for i, v in vals:
            assert out[i] == max(lo, min(hi, v)), (i, v)
        # clamping actually fired on both tails for this distribution
        assert any(v < lo for _, v in vals) and any(v > hi for _, v in vals)

    def test_rejects_bad_bounds(self, spark):
        from flatbread_spark.operators.ranking import winsorize

        df = spark.createDataFrame([(1, 1)], "id bigint, v bigint")
        with pytest.raises(ValueError):
            winsorize(df, "v", "id", 900_000, 100_000)
        with pytest.raises(ValueError):
            winsorize(df, "v", "id", 0, 500_000)


# ---------------------------------------------------------- group_percentiles
class TestGroupPercentiles:
    def test_matches_python_per_group(self, spark):
        from flatbread_spark.operators.ranking import group_percentiles

        rows = [(i, ["a", "b", "c"][i % 3], (i * 37) % 101) for i in range(90)]
        rows += [(1000, "d", 5)]  # singleton group: every q maps to pos 1
        df = spark.createDataFrame(rows, "id bigint, g string, v bigint")
        qs = [10_000, 500_000, 990_000]
        out = {}
        for r in group_percentiles(df, "g", "v", "id", qs).collect():
            out[(r["g"], r["q_ppm"])] = (r["pos"], r["n"], r["v"])
        by_g = {}
        for _id, g, v in rows:
            by_g.setdefault(g, []).append((v, _id))
        expect = {}
        for g, members in by_g.items():
            members.sort()
            n = len(members)
            for q in qs:
                pos = (q * n + 999_999) // 1_000_000
                expect[(g, q)] = (pos, n, members[pos - 1][0])
        assert out == expect
        # singleton group answered every quantile with its only value
        assert out[("d", 10_000)] == (1, 1, 5)

    def test_agrees_with_global_on_one_group(self, spark):
        from flatbread_spark.operators.ranking import (
            exact_percentiles,
            group_percentiles,
        )

        df = spark.createDataFrame(
            [(i, "only", (i * 7) % 50) for i in range(40)],
            "id bigint, g string, v bigint",
        )
        qs = [250_000, 750_000]
        per_group = {
            r["q_ppm"]: (r["pos"], r["n"], r["v"])
            for r in group_percentiles(df, "g", "v", "id", qs).collect()
        }
        global_ = {
            r["q_ppm"]: (r["pos"], r["n"], r["v"])
            for r in exact_percentiles(df, "v", "id", qs).collect()
        }
        assert per_group == global_

    def test_rejects_bad_q(self, spark):
        from flatbread_spark.operators.ranking import group_percentiles

        df = spark.createDataFrame([(1, "g", 1)], "id bigint, g string, v bigint")
        with pytest.raises(ValueError):
            group_percentiles(df, "g", "v", "id", [])


# ---------------------------------------------------------------- standardize
class TestStandardize:
    def test_matches_python_moments(self, spark):
        import math

        from flatbread_spark.operators.curation import standardize

        rows = [(i, ["a", "b"][i % 2], float((i * 37) % 101)) for i in range(80)]
        df = spark.createDataFrame(rows, "id bigint, g string, v double")
        out = {r["id"]: r["zscore"] for r in standardize(df, "g", "v").collect()}
        by_g = {}
        for _id, g, v in rows:
            by_g.setdefault(g, []).append((_id, v))
        for g, members in by_g.items():
            n = len(members)
            s = sum(round(v, 12) for _, v in members)
            ss = sum(round(v * v, 12) for _, v in members)
            mean = s / n
            std = math.sqrt(ss / n - mean * mean)
            for _id, v in members:
                assert out[_id] == round((v - mean) / std, 6), (_id, g)

    def test_zero_variance_group_nulls(self, spark):
        from flatbread_spark.operators.curation import standardize

        df = spark.createDataFrame(
            [(1, "z", 5.0), (2, "z", 5.0), (3, "y", 1.0), (4, "y", 3.0)],
            "id bigint, g string, v double",
        )
        out = {r["id"]: r["zscore"] for r in standardize(df, "g", "v").collect()}
        assert out[1] is None and out[2] is None
        assert out[3] == -1.0 and out[4] == 1.0


# ----------------------------------------------------------- event_transitions
class TestEventTransitions:
    def test_matches_python_chains(self, spark):
        from collections import Counter

        from flatbread_spark.operators.events import event_transitions

        # user 1: a->b->a->c ; user 2: b->b->a ; user 3: c (no transitions)
        rows = [
            (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"), (4, 1, 40, "c"),
            (5, 2, 10, "b"), (6, 2, 20, "b"), (7, 2, 30, "a"),
            (8, 3, 10, "c"),
        ]
        df = spark.createDataFrame(rows, "eid bigint, u bigint, t bigint, s string")
        out = {
            (r["from_state"], r["to_state"]): (r["n"], r["n_from"], r["p_ppm"])
            for r in event_transitions(df, "u", "t", "s", "eid").collect()
        }
        chains = {1: "abac", 2: "bba", 3: "c"}
        pairs = Counter()
        for seq in chains.values():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += 1
        from_tot = Counter()
        for (a, _), n in pairs.items():
            from_tot[a] += n
        assert set(out) == set(pairs)
        for (a, b), n in pairs.items():
            assert out[(a, b)] == (
                n, from_tot[a], n * 1_000_000 // from_tot[a]
            ), (a, b)

    def test_probabilities_sum_per_from_state(self, spark):
        from flatbread_spark.operators.events import event_transitions

        rows = [(i, i % 7, i, ["x", "y", "z"][i % 3]) for i in range(200)]
        df = spark.createDataFrame(rows, "eid bigint, u bigint, t bigint, s string")
        out = event_transitions(df, "u", "t", "s", "eid").collect()
        from collections import defaultdict

        sums = defaultdict(int)
        ns = defaultdict(int)
        for r in out:
            sums[r["from_state"]] += r["p_ppm"]
            ns[r["from_state"]] += 1
        # floor division: sum within (1e6 - n_pairs, 1e6]
        for s, tot in sums.items():
            assert 1_000_000 - ns[s] < tot <= 1_000_000, s


# --------------------------------------------------------------- session_paths
class TestSessionPaths:
    def _events(self, spark):
        # user 1: a,b,a,c ; user 2: b,b,a ; user 3: c
        rows = [
            (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"), (4, 1, 40, "c"),
            (5, 2, 10, "b"), (6, 2, 20, "b"), (7, 2, 30, "a"),
            (8, 3, 10, "c"),
        ]
        return spark.createDataFrame(
            rows, "eid bigint, u bigint, t bigint, s string"
        )

    def test_matches_python_prefixes(self, spark):
        from collections import Counter

        from flatbread_spark.operators.events import session_paths

        df = self._events(spark)
        out = {
            r["path"]: (r["n_keys"], r["share_ppm"])
            for r in session_paths(df, "u", "t", "s", k=3, tiebreak_col="eid")
            .collect()
        }
        chains = {1: "abac", 2: "bba", 3: "c"}
        expect = Counter(">".join(seq[:3]) for seq in chains.values())
        total = len(chains)
        assert set(out) == set(expect)
        for path, n in expect.items():
            assert out[path] == (n, n * 1_000_000 // total), path

    def test_prefix_bounded_by_k(self, spark):
        from flatbread_spark.operators.events import session_paths

        # one bot user with 1000 events: the path is still only k long
        rows = [(i, 1, i, "x") for i in range(1000)]
        df = spark.createDataFrame(rows, "eid bigint, u bigint, t bigint, s string")
        out = session_paths(df, "u", "t", "s", k=4, tiebreak_col="eid").collect()
        assert len(out) == 1
        assert out[0]["path"] == "x>x>x>x"
        assert out[0]["n_keys"] == 1
        assert out[0]["share_ppm"] == 1_000_000

    def test_tiebreak_makes_order_total(self, spark):
        from flatbread_spark.operators.events import session_paths

        # all timestamps collide: eid is the only order
        rows = [(i, 7, 0, chr(ord("a") + i)) for i in range(5)]
        df = spark.createDataFrame(rows, "eid bigint, u bigint, t bigint, s string")
        out = session_paths(df, "u", "t", "s", k=5, tiebreak_col="eid").collect()
        assert out[0]["path"] == "a>b>c>d>e"

    def test_short_keys_keep_short_paths(self, spark):
        from flatbread_spark.operators.events import session_paths

        df = self._events(spark)
        out = {
            r["path"]: r["n_keys"]
            for r in session_paths(df, "u", "t", "s", k=10, tiebreak_col="eid")
            .collect()
        }
        assert out == {"a>b>a>c": 1, "b>b>a": 1, "c": 1}

    def test_k_validation(self, spark):
        import pytest

        from flatbread_spark.operators.events import session_paths

        with pytest.raises(ValueError):
            session_paths(self._events(spark), "u", "t", "s", k=0)
