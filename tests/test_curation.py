"""Curation funnel: stage arithmetic must chain and match direct filters."""
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def report(spark, documents):
    from flatbread_spark.operators.curation import curation_funnel

    nw = F.size(F.split(F.trim("text"), r"\s+"))
    return curation_funnel(
        documents.select("doc_id", "lang", "text"),
        key_col="doc_id",
        pre_stages=[
            ("lang", F.col("lang").isin("en", "de")),
            ("word_count", nw >= 30),
        ],
        dedup_on=F.md5(F.substring("text", 1, 40)),
        dedup_name="dup40",
        post_stages=[("short_tail", nw <= 500)],
    ).orderBy("stage_idx")


def test_funnel_chains(report, documents):
    rows = report.collect()
    assert [r.stage for r in rows] == ["lang", "word_count", "dup40", "short_tail"]
    assert rows[0].n_in == documents.count()
    for prev, cur in zip(rows, rows[1:]):
        assert prev.n_out == cur.n_in
    for r in rows:
        assert r.n_out == r.n_in - r.n_removed
        assert r.n_removed >= 0


def test_funnel_matches_direct_filters(report, documents):
    rows = {r.stage: r for r in report.collect()}
    nw = F.size(F.split(F.trim("text"), r"\s+"))
    s1 = documents.filter(F.col("lang").isin("en", "de"))
    assert rows["lang"].n_out == s1.count()
    s2 = s1.filter(nw >= 30)
    assert rows["word_count"].n_out == s2.count()
    s3 = s2.withColumn("__h", F.md5(F.substring("text", 1, 40))).groupBy("__h").agg(
        F.min("doc_id")
    )
    assert rows["dup40"].n_out == s3.count()


def test_duplicate_stage_names_rejected(documents):
    from flatbread_spark.operators.curation import curation_funnel

    with pytest.raises(ValueError):
        curation_funnel(
            documents,
            key_col="doc_id",
            pre_stages=[("a", F.lit(True)), ("a", F.lit(True))],
        )


def test_null_predicate_counts_as_failure(spark):
    from flatbread_spark.operators.curation import curation_funnel

    df = spark.createDataFrame(
        [(1, "ok text here"), (2, None)], "doc_id long, text string"
    )
    nw = F.size(F.split(F.trim("text"), r"\s+"))
    rows = {r.stage: r for r in curation_funnel(
        df, key_col="doc_id", pre_stages=[("len", nw >= 2)]
    ).collect()}
    # the NULL-text doc must be charged to the stage, matching df.filter()
    assert rows["len"].n_removed == 1
    assert rows["len"].n_out == df.filter(nw >= 2).count()
