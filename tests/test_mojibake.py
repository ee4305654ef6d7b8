"""Encoding-artifact scorer: counts checked against a pure-Python
re-derivation over hand-built clean/dirty strings."""
from pyspark.sql import functions as F  # noqa: F401


class TestMojibake:
    def test_counts_match_python(self, spark):
        from flatbread_spark.functions.text import with_mojibake

        texts = {
            1: "clean ascii text only",
            2: "cafÃ© and â€œquotedâ€ text",
            3: "bad � char and  control",
            4: "SÃO PAULO Â  nbsp artifact",
            5: "",
            6: "double-encoded replacement ï¿½ here",
        }
        df = spark.createDataFrame(list(texts.items()), "id bigint, text string")
        out = {r["id"]: r for r in with_mojibake(df, "text").collect()}

        def counts(t):
            n_rep = t.count("�")
            n_c1 = sum(1 for ch in t if 0x80 <= ord(ch) <= 0x9F)
            n_dbl = (
                t.count("Ã")
                + t.count("Â")
                + t.count("â€")
                + t.count("ï¿½")
            )
            total = n_rep + n_c1 + n_dbl
            return n_rep, n_c1, n_dbl, total * 10000 // max(len(t), 1)

        for i, t in texts.items():
            r = out[i]
            got = (
                r["n_replacement"], r["n_c1"], r["n_double_enc"],
                r["mojibake_per_10k"],
            )
            assert got == counts(t), (i, t, got)

    def test_clean_corpus_scores_zero(self, spark, documents):
        from flatbread_spark.functions.text import with_mojibake

        mx = (
            with_mojibake(documents.select("doc_id", "text"), "text")
            .agg(F.max("mojibake_per_10k"))
            .first()[0]
        )
        assert mx == 0
