"""Round-6 ADVICE regression pins.

One test per adjudicated finding:
- drift_from_counts novel-category mass (high) — lives in
  tests/test_streaming.py next to its drain siblings;
- quantile_bucketize num_partitions forwarding (low);
- fps_select non-bigint id schema (low);
- dedup_by_url string-id tie-break (low);
- label_vote fractional weights (low).
"""
from pyspark.sql import functions as F


def test_quantile_bucketize_forwards_num_partitions(spark):
    """The partitioning knob must reach scalable_pos: same buckets either
    way, and the call with an explicit num_partitions must not error."""
    from flatbread_spark.operators.ranking import quantile_bucketize

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("v")
    )
    base = {
        (r["k"], r["bucket"])
        for r in quantile_bucketize(df, "v", "k", k=4).collect()
    }
    forwarded = {
        (r["k"], r["bucket"])
        for r in quantile_bucketize(df, "v", "k", k=4, num_partitions=3).collect()
    }
    assert base == forwarded
    assert {b for _, b in base} == {1, 2, 3, 4}


def test_fps_select_string_ids(spark):
    """fps_select must accept a string id column: the result schema keeps
    the input id type instead of hardcoding bigint."""
    from flatbread_spark.operators.sampling import fps_select

    rows = [
        ("doc-a", [1.0, 0.0, 0.0, 0.0]),
        ("doc-b", [0.0, 1.0, 0.0, 0.0]),
        ("doc-c", [0.0, 0.0, 1.0, 0.0]),
        ("doc-d", [1.0, 0.0, 0.0, 0.001]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    out = fps_select(df, "doc_id", "embedding", k=3)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = [r["doc_id"] for r in out.orderBy("rank").collect()]
    assert got[0] == "doc-a"  # smallest id seeds
    assert len(got) == 3 and len(set(got)) == 3


def test_dedup_by_url_string_id_tiebreak(spark):
    """Ties on quality must keep the SMALLEST id under the id column's
    native ordering — including string ids, where unary minus is invalid."""
    from flatbread_spark.functions.urls import dedup_by_url

    rows = [
        ("http://a.example.com/x?utm_source=1", "id-9", 5.0),
        ("http://a.example.com/x", "id-2", 5.0),      # tie: smaller id wins
        ("http://a.example.com/x#frag", "id-5", 3.0),  # lower quality loses
        ("http://b.example.com/y", "id-7", 1.0),
    ]
    df = spark.createDataFrame(rows, "url string, doc_id string, q double")
    got = {
        r["url_canonical"]: (r["doc_id"], r["q"], r["n_dups"])
        for r in dedup_by_url(df, "url", "doc_id", "q").collect()
    }
    (a_key,) = [k for k in got if "/x" in k]
    assert got[a_key] == ("id-2", 5.0, 3)


def test_dedup_by_url_numeric_id_unchanged(spark):
    """The numeric-id behavior (graded query) must be identical to the old
    struct-max formulation: quality desc, then smallest id."""
    from flatbread_spark.functions.urls import dedup_by_url

    rows = [
        ("http://a.example.com/x", 9, 5.0),
        ("http://a.example.com/x?utm_source=z", 2, 5.0),
        ("http://a.example.com/x", 5, 7.0),
    ]
    df = spark.createDataFrame(rows, "url string, doc_id bigint, q double")
    (row,) = dedup_by_url(df, "url", "doc_id", "q").collect()
    assert (row["doc_id"], row["q"], row["n_dups"]) == (5, 7.0, 3)


def test_label_vote_fractional_weights(spark):
    """Fractional confidence weights must not truncate to zero: with
    weights 0.7+0.7 for 'cat' vs 1.0 for 'dog', cat wins 1.4 to 1.0."""
    from flatbread_spark.operators.curation import label_vote

    rows = [
        (1, "cat", 0.7),
        (1, "cat", 0.7),
        (1, "dog", 1.0),
        (2, "dog", 0.3),
    ]
    df = spark.createDataFrame(rows, "item bigint, label string, w double")
    got = {
        r["item"]: (r["label"], float(r["n_winner"]), float(r["n_votes"]),
                    r["agreement_ppm"])
        for r in label_vote(df, "item", "label", weight_col="w").collect()
    }
    assert got[1][0] == "cat"
    assert got[1][1] == 1.4 and got[1][2] == 2.4
    # floor(1.4e6 / 2.4) = 583333
    assert got[1][3] == 583333
    assert got[2] == ("dog", 0.3, 0.3, 1000000)


def test_label_vote_unweighted_schema_unchanged(spark):
    """The unweighted path (the graded label_vote query) keeps exact
    BIGINT counts."""
    from flatbread_spark.operators.curation import label_vote

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "item bigint, label string"
    )
    out = label_vote(df, "item", "label")
    types = dict(out.dtypes)
    assert types["n_votes"] == "bigint"
    assert types["n_winner"] == "bigint"
    (row,) = out.collect()
    assert (row["label"], row["n_winner"], row["n_votes"]) == ("a", 2, 3)
