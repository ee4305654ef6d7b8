"""Vocabulary analytics: characteristic_terms (exact integer lift top-k)
and doc_freq_spectrum (power-of-2 DF buckets) vs pure-Python oracles."""
import pytest


CORPORA = {
    "s1": ["spark spark join join join agg", "spark table scan"],
    "s2": ["cat dog cat dog bird", "dog dog dog spark"],
}


def _df(spark):
    rows = [
        (i, text, src)
        for i, (src, text) in enumerate(
            (s, t) for s, ts in sorted(CORPORA.items()) for t in ts
        )
    ]
    return spark.createDataFrame(rows, "id bigint, text string, src string")


class TestCharacteristicTerms:
    @staticmethod
    def _oracle(k, min_count):
        from collections import Counter

        cnt = {
            g: Counter(w for t in ts for w in t.split())
            for g, ts in CORPORA.items()
        }
        tot = Counter()
        for c in cnt.values():
            tot.update(c)
        N = sum(tot.values())
        out = {}
        for g, c in cnt.items():
            ng = sum(c.values())
            scored = [
                (t, n, n * N * 1_000_000 // (ng * tot[t]))
                for t, n in c.items()
                if n >= min_count
            ]
            scored.sort(key=lambda x: (-x[2], x[0]))
            out[g] = [
                (t, r + 1, n, tot[t], ng, lift)
                for r, (t, n, lift) in enumerate(scored[:k])
            ]
        return out

    def test_matches_python_lift(self, spark):
        from flatbread_spark.operators.vocabulary import characteristic_terms

        got = {}
        rows = characteristic_terms(
            _df(spark), "src", "text", k=3, min_count=2
        ).collect()
        for r in rows:
            got.setdefault(r["src"], []).append(
                (r["term"], r["rank"], r["n"], r["n_term"], r["n_grp"],
                 r["lift_ppm"])
            )
        for g in got:
            got[g].sort(key=lambda x: x[1])
        assert got == self._oracle(3, 2)

    def test_min_count_suppresses_hapax(self, spark):
        from flatbread_spark.operators.vocabulary import characteristic_terms

        rows = characteristic_terms(
            _df(spark), "src", "text", k=10, min_count=3
        ).collect()
        assert all(r["n"] >= 3 for r in rows)
        # join (3x) and spark (3x) in s1, dog (5x) in s2 survive
        assert sorted((r["src"], r["term"]) for r in rows) == [
            ("s1", "join"), ("s1", "spark"), ("s2", "dog"),
        ]

    def test_validation(self, spark):
        from flatbread_spark.operators.vocabulary import characteristic_terms

        with pytest.raises(ValueError):
            characteristic_terms(_df(spark), "src", "text", k=0)
        with pytest.raises(ValueError):
            characteristic_terms(_df(spark), "src", "text", min_count=0)


class TestDocFreqSpectrum:
    def test_matches_python(self, spark):
        from collections import Counter

        from flatbread_spark.operators.vocabulary import doc_freq_spectrum

        docs = [t for ts in CORPORA.values() for t in ts]
        dfreq = Counter()
        for t in docs:
            for w in set(t.split()):
                dfreq[w] += 1
        buckets = {}
        for w, d in dfreq.items():
            lo = 1 << (d.bit_length() - 1)
            n, p = buckets.get(lo, (0, 0))
            buckets[lo] = (n + 1, p + d)
        got = {
            r["bucket_lo"]: (r["bucket_hi"], r["n_terms"], r["n_postings"])
            for r in doc_freq_spectrum(_df(spark), "id", "text").collect()
        }
        assert got == {
            lo: (lo * 2, n, p) for lo, (n, p) in buckets.items()
        }

    def test_within_doc_repeats_count_once(self, spark):
        from flatbread_spark.operators.vocabulary import doc_freq_spectrum

        rows = [(1, "x x x x x"), (2, "x y")]
        df = spark.createDataFrame(rows, "id bigint, text string")
        got = {
            r["bucket_lo"]: (r["n_terms"], r["n_postings"])
            for r in doc_freq_spectrum(df, "id", "text").collect()
        }
        # x: df=2 (bucket 2), y: df=1 (bucket 1)
        assert got == {1: (1, 1), 2: (1, 2)}
