"""Code-switch audit: segment languages, majority, minority ppm and
switch counts checked against a pure-Python re-derivation."""
import pytest
from pyspark.sql import functions as F  # noqa: F401

EN = "the cat and the dog of a to and the"            # 10 tokens, en markers
DE = "der hund und die katze das und ein der die"     # 10 tokens, de markers
XX = "zzz qqq rrr sss ttt uuu vvv www xxx yyy"        # 10 tokens, no markers


class TestLangSegments:
    def _expected(self, text, w=10):
        from flatbread_spark.functions.text import LANG_MARKERS

        toks = text.lower().split()
        nseg = max(1, (len(toks) + w - 1) // w)
        langs = []
        for i in range(nseg):
            seg = toks[i * w:(i + 1) * w]
            scores = [
                (sum(1 for t in seg if t in m), -j, lang)
                for j, (lang, m) in enumerate(LANG_MARKERS.items())
            ]
            s, _, lang = max(scores)
            langs.append(lang if s > 0 else "und")
        from collections import Counter

        c = Counter(langs)
        n_maj, maj = max((n, lg) for lg, n in c.items())
        switches = sum(1 for a, b in zip(langs, langs[1:]) if a != b)
        return (
            nseg, maj, n_maj,
            (nseg - n_maj) * 1_000_000 // nseg, switches,
        )

    def test_matches_python(self, spark):
        from flatbread_spark.functions.text import with_lang_segments

        texts = {
            1: EN,
            2: " ".join([EN, DE]),            # one switch
            3: " ".join([EN, DE, EN]),        # two switches
            4: XX,                            # all und
            5: " ".join([EN, XX, DE]),        # und in the middle
            6: "short",                       # < window: one segment
        }
        df = spark.createDataFrame(list(texts.items()), "id bigint, text string")
        out = {
            r["id"]: (
                r["n_segments"], r["majority_lang"], r["n_majority"],
                r["minority_ppm"], r["n_switches"],
            )
            for r in with_lang_segments(df, "id", "text", 10).collect()
        }
        for i, t in texts.items():
            assert out[i] == self._expected(t), (i, t, out[i])
        # spot semantic checks
        assert out[2][4] == 1 and out[3][4] == 2
        assert out[4][1] == "und"

    def test_rejects_bad_window(self, spark):
        from flatbread_spark.functions.text import with_lang_segments

        df = spark.createDataFrame([(1, "x")], "id bigint, text string")
        with pytest.raises(ValueError):
            with_lang_segments(df, "id", "text", 0)
