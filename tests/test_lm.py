"""Trigram typicality: garbage scores low, model reuse, short-text edge."""
from pyspark.sql import functions as F


def test_garbage_scores_below_normal_text(spark, documents):
    from flatbread_spark.operators.lm import trigram_typicality

    garbage = spark.createDataFrame(
        [(900001, "en", "qqxj zzvk wqqx jjzz kkvv xxqq zjzj vkvk qxqx zzjj")],
        "doc_id long, lang string, text string",
    )
    en = documents.filter(F.col("lang") == "en").select("doc_id", "lang", "text")
    out = trigram_typicality(en.unionByName(garbage), "doc_id", "text", "lang")
    g = out.filter(F.col("doc_id") == 900001).first()
    med = out.filter(F.col("doc_id") != 900001).agg(
        F.expr("percentile(avg_freq, 0.5)")
    ).first()[0]
    assert g.avg_freq < med / 5, (g.avg_freq, med)


def test_pretrained_model_reuse(spark, documents):
    from flatbread_spark.operators.lm import trigram_counts, trigram_typicality

    docs = documents.select("doc_id", "lang", "text")
    model = trigram_counts(docs, "text", "lang")
    # vocabulary-bounded: far fewer rows than trigram instances
    n_instances = docs.select(
        F.sum(F.greatest(F.length(F.lower("text")) - 2, F.lit(0)))
    ).first()[0]
    assert model.count() < n_instances / 5
    scored_self = trigram_typicality(docs, "doc_id", "text", "lang")
    scored_given = trigram_typicality(
        docs, "doc_id", "text", "lang", model=model
    )
    a = {r.doc_id: r.sum_freq for r in scored_self.collect()}
    b = {r.doc_id: r.sum_freq for r in scored_given.collect()}
    assert a == b
    # plain-dict model (ADVICE r4): no Spark job inside the builder,
    # identical scores
    mdict = {(r["lang"], r["tri"]): int(r["c"]) for r in model.collect()}
    scored_dict = trigram_typicality(
        docs, "doc_id", "text", "lang", model=mdict
    )
    c = {r.doc_id: r.sum_freq for r in scored_dict.collect()}
    assert a == c


def test_short_text_yields_no_trigrams(spark):
    from flatbread_spark.operators.lm import char_ngrams

    df = spark.createDataFrame([("ab",), ("abc",), ("",)], "t string")
    rows = df.select(char_ngrams(F.col("t")).alias("g")).collect()
    assert [len(r.g) for r in rows] == [0, 1, 0]


def test_oov_trigrams_score_zero_not_excluded(spark):
    from flatbread_spark.operators.lm import trigram_counts, trigram_typicality

    clean = spark.createDataFrame(
        [(i, "en", "the cat sat on the mat again and again") for i in range(5)],
        "doc_id long, lang string, text string",
    )
    model = trigram_counts(clean, "text", "lang")
    # doc made of trigrams the model has never seen must still be scored,
    # with OOV frequency 0 dragging the average DOWN
    garbage = spark.createDataFrame(
        [(99, "en", "zzqqxxjjvvkkww zzqqxxjjvvkkww")],
        "doc_id long, lang string, text string",
    )
    out = trigram_typicality(garbage, "doc_id", "text", "lang", model=model)
    row = out.first()
    assert row is not None and row.doc_id == 99
    assert row.sum_freq == 0 and row.avg_freq == 0.0


def test_null_lang_scores_zero(spark):
    """NULL lang matches nothing in the model — SQL join-on-lang semantics,
    not Python (None, tri) dict-key equality."""
    from flatbread_spark.operators.lm import trigram_typicality

    df = spark.createDataFrame(
        [(0, "en", "hello hello"), (1, None, "hello hello")],
        "doc_id bigint, lang string, text string",
    )
    rows = {
        r.doc_id: r
        for r in trigram_typicality(df, "doc_id", "text", "lang").collect()
    }
    assert rows[0].sum_freq > 0
    assert rows[1].sum_freq == 0 and rows[1].avg_freq == 0.0
    assert rows[1].n_tris == rows[0].n_tris  # OOV mass still counted
