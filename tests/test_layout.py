"""Z-order layout: bit-exact Morton keys and two-dimensional locality."""
from pyspark.sql import functions as F


def _morton_ref(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference(spark):
    from flatbread_spark.operators.layout import zorder_key

    data = [(a, b) for a in (0, 1, 5, 513, 1023) for b in (0, 2, 7, 800, 1023)]
    df = spark.createDataFrame(data, "a long, b long")
    rows = df.select("a", "b", zorder_key(F.col("a"), F.col("b"), 10).alias("z")).collect()
    for r in rows:
        assert r.z == _morton_ref(r.a, r.b, 10), (r.a, r.b)


def test_cluster_by_zorder_tightens_both_dims(spark, orders):
    from flatbread_spark.operators.layout import cluster_by_zorder

    base = orders.select("o_orderkey", "o_custkey",
                         F.dayofyear("o_orderdate").alias("oday"))
    clustered = cluster_by_zorder(base, "o_custkey", "oday", bits=10,
                                  num_partitions=8)
    spans = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("o_custkey") - F.min("o_custkey")).alias("cspan"),
             (F.max("oday") - F.min("oday")).alias("dspan"),
             F.count("*").alias("n"))
        .collect()
    )
    full_c = base.agg(F.max("o_custkey") - F.min("o_custkey")).first()[0]
    full_d = base.agg(F.max("oday") - F.min("oday")).first()[0]
    # a hash/random layout gives every partition ~the full span in BOTH
    # dims; z-order must tighten at least one dim in most partitions
    tightened = sum(
        1 for r in spans if r.cspan < full_c * 0.8 or r.dspan < full_d * 0.8
    )
    assert tightened >= len(spans) * 0.5, (spans, full_c, full_d)
    assert sum(r.n for r in spans) == base.count()
