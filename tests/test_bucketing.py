"""Bucketed co-located join: the point is the PLAN — no Exchange on the
bucketed sides — plus result equality with the plain join."""
import pytest

from pyspark.sql import functions as F

from flatbread_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, orders, lineitem, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], n_buckets=4,
        path=str(wh / "b_orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=4,
        path=str(wh / "b_lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # small test tables auto-broadcast, which bypasses bucketed scans; force
    # the sort-merge path the helper exists for (at 100 TB neither side
    # broadcasts anyway)
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, orders, lineitem, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = (
        bucketed_join(spark, lt, rt, ["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agged = spark.table(lt).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_read_write_roundtrip_formats(spark, orders, tmp_path):
    """write_table/read_table round-trip across formats; partitioned parquet
    write produces hive-style dirs that prune on the partition key."""
    from flatbread_spark.sources.tables import read_table, write_table

    sample = orders.select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).limit(200)
    expected = sorted(
        (r.o_orderkey, r.o_orderpriority, round(r.o_totalprice, 2))
        for r in sample.collect()
    )

    for fmt in ("parquet", "orc", "csv", "json"):
        path = str(tmp_path / f"rt_{fmt}")
        write_table(sample, path, fmt=fmt, mode="overwrite")
        back = read_table(spark, path, fmt=fmt, schema=sample.schema)
        got = sorted(
            (r.o_orderkey, r.o_orderpriority, round(r.o_totalprice, 2))
            for r in back.collect()
        )
        assert got == expected, fmt

    # partitioned write: directory per key, scan prunes to one partition
    ppath = str(tmp_path / "rt_part")
    write_table(sample, ppath, mode="overwrite", partition_by="o_orderpriority")
    one = read_table(spark, ppath).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == sum(1 for _, p, _ in expected if p == "1-URGENT")
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
