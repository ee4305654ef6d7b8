"""Skew helpers: salted two-stage aggregation and salt-explode join must be
semantically identical to their plain counterparts."""
from pyspark.sql import functions as F

from flatbread_spark.operators.skew import salt_explode_join, salted_agg


def test_salted_agg_equals_plain_agg(spark, lineitem):
    plain = {
        r.l_returnflag: (r.n, round(r.s, 6))
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.s, 6))
        for r in salted_agg(
            lineitem,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "s": (
                    F.sum(F.col("l_quantity").cast("decimal(27,6)")),
                    F.sum("s").cast("double"),
                ),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salt_explode_join_equals_plain_join(spark, orders):
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
         ("4-NOT SPECIFIED", 4), ("5-LOW", 5)],
        ["o_orderpriority", "prio_rank"],
    )
    plain = (
        orders.join(dim, ["o_orderpriority"])
        .groupBy("prio_rank").count().collect()
    )
    salted = (
        salt_explode_join(orders, dim, ["o_orderpriority"], n_salts=4)
        .groupBy("prio_rank").count().collect()
    )
    assert sorted((r.prio_rank, r["count"]) for r in plain) == \
        sorted((r.prio_rank, r["count"]) for r in salted)


def test_knn_ivf_recall(spark, embeddings):
    from flatbread_spark.operators.similarity import knn_bruteforce, knn_ivf

    cents = [
        (i, list(r.embedding))
        for i, r in enumerate(embeddings.orderBy("vec_id").limit(16).collect())
    ]
    q = embeddings.filter(F.col("vec_id") < 10)
    e = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(embeddings, q, k=5).collect()}
    a = {(r.query_id, r.neighbor_id) for r in knn_ivf(embeddings, q, cents, k=5, nprobe=6).collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
