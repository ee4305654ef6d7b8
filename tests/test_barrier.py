"""plans/barrier.py gate_rows: filter semantics + the non-pushdown
guarantee it exists for."""
from pyspark.sql import functions as F

from flatbread_spark.plans.barrier import gate_rows


def test_gate_rows_matches_filter_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -2), (4, None)], "id bigint, v bigint"
    )
    got = sorted(r["id"] for r in gate_rows(df, F.col("v") > 0).collect())
    want = sorted(r["id"] for r in df.filter(F.col("v") > 0).collect())
    assert got == want == [1]
    # NULL condition counts as false, like .filter
    assert gate_rows(df, F.lit(None).cast("boolean")).count() == 0
    # schema passes through unchanged
    assert gate_rows(df, F.col("v") > 0).columns == df.columns


def test_gate_rows_does_not_push_below_projection(spark):
    """The whole point: a predicate over a computed column must reference
    the materialized attribute, not a re-inlined copy of its defining
    expression. With .filter, Catalyst pushes the predicate below the
    Project and the expensive expression appears TWICE in the plan; with
    gate_rows it appears exactly once."""
    df = spark.createDataFrame([("a b c",), ("x",)], "text string")
    computed = df.select(
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("__n")
    )

    pushed = computed.filter(F.col("__n") >= 2)
    pushed_plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert pushed_plan.count("split(") >= 2  # the pushback this guards

    gated = gate_rows(computed, F.col("__n") >= 2)
    gated_plan = gated._jdf.queryExecution().executedPlan().toString()
    assert gated_plan.count("split(") == 1, gated_plan
    assert gated.count() == 1
