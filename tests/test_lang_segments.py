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
        # packed-count bit width bound (r10 bitpack rewrite)
        with pytest.raises(ValueError):
            with_lang_segments(df, "id", "text", 4096)

    def test_packed_rewrite_edge_parity(self, spark):
        """r10 bitpack-rewrite pins: the packed-code path must reproduce
        the per-language-filter semantics on the cases that stress it —
        a token matching markers of TWO languages ('la' is es AND fr),
        exact score ties (earliest LANG_MARKERS entry wins), null /
        empty / whitespace-only text ('und'), and a partial last
        segment."""
        from flatbread_spark.functions.text import with_lang_segments

        texts = {
            # 'la' scores for es and fr simultaneously; 'le les' breaks
            # the tie in favor of fr within the same segment
            1: "la la le les qqq",
            # dead tie: one es-only marker vs one fr-only marker ->
            # earliest dict entry among tied (es before fr)
            2: "que les zzz qqq rrr",
            # en and de tie at 2 markers each -> en (earlier entry)
            3: "the and der die zzz",
            4: None,
            5: "",
            6: "   ",
            # 7 tokens at w=5: full segment + 2-token partial segment
            7: "the of la la der und zzz",
        }
        df = spark.createDataFrame(
            list(texts.items()), "id bigint, text string"
        )
        out = {
            r["id"]: (
                r["n_segments"], r["majority_lang"], r["n_majority"],
                r["minority_ppm"], r["n_switches"],
            )
            for r in with_lang_segments(df, "id", "text", 5).collect()
        }
        for i, t in texts.items():
            assert out[i] == self._expected(t or "", 5), (i, t, out[i])
        # the multi-language token counted for BOTH es and fr: 'la la'
        # gives es 2, fr 2+2('le','les')=... fr wins segment 1
        assert out[1][1] == "fr"
        assert out[2][1] == "es"   # tie -> earliest LANG_MARKERS entry
        assert out[3][1] == "en"
        assert out[4] == (1, "und", 1, 0, 0)
        assert out[5] == (1, "und", 1, 0, 0)
        assert out[6] == (1, "und", 1, 0, 0)
        assert out[7][0] == 2      # partial trailing segment counted
