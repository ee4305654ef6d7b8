"""Plan facts for the round-4 operator family: the scale properties the
designs claim (broadcast model joins, map-side argmin, single-scan funnels)
must be visible in the physical plan, so a regression that silently
re-introduces a shuffle or a sort-merge join fails here."""
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_trigram_score_pass_is_map_side(spark, documents):
    """The model rides the scoring kernel's closure — the score pass is a
    pure map-side projection: no join, no Exchange of any kind."""
    from flatbread_spark.operators.lm import trigram_typicality

    plan = _plan(trigram_typicality(documents, "doc_id", "text", "lang"))
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_kmeans_assignment_is_map_side(spark, embeddings):
    from flatbread_spark.operators.kmeans import _assign

    init = [
        [float(x) for x in r[1]]
        for r in embeddings.select("vec_id", "embedding")
        .orderBy("vec_id").limit(4).collect()
    ]
    plan = _plan(_assign(embeddings.select("vec_id", "embedding"),
                         "embedding", init))
    # centroids ride the Arrow kernel's closure; assignment is a pure
    # map-side projection — no join, no Exchange of any kind
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_quantization_is_shuffle_free(spark, embeddings):
    from flatbread_spark.functions.vectors import int8_codes, int8_scale

    staged = embeddings.select("vec_id", "embedding").withColumn(
        "scale", int8_scale(F.col("embedding"))
    )
    out = staged.withColumn("codes", int8_codes(F.col("embedding"), F.col("scale")))
    assert _plan(out).count("Exchange") == 0


def test_curation_funnel_is_single_scan(spark, documents):
    from flatbread_spark.operators.curation import curation_funnel

    nw = F.size(F.split(F.trim("text"), r"\s+"))
    report = curation_funnel(
        documents.select("doc_id", "text"),
        key_col="doc_id",
        pre_stages=[("len", nw >= 10)],
        dedup_on=F.md5("text"),
    )
    # after the counts checkpoint the report plan reads NO parquet at all —
    # the corpus scan happened exactly once, inside the checkpoint
    assert _plan(report).count("Scan parquet") == 0


def test_no_query_plans_a_cartesian_product(spark):
    """Repo-wide invariant: no declared query's physical plan contains a
    CartesianProduct. BroadcastNestedLoopJoin is allowed — every occurrence
    in this repo has a scalar/presentation-sized build side (margin
    denominators, k query vectors, a 4-row sweep grid) — but an
    un-broadcast cross product is always a bug at corpus scale.
    Streaming queries are skipped (plan building would execute them)."""
    import __spark_entry__ as e

    skip = {"stream_replay", "stream_dedup_replay", "stream_quality_gate"}
    offenders = {}
    for name, fn in e.queries().items():
        if name in skip:
            continue
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        n = plan.count("CartesianProduct")
        if n:
            offenders[name] = n
    assert not offenders, offenders
