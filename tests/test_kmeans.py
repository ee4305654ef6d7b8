"""Lloyd k-means: objective decreases, deterministic, init validated."""
import pytest
from pyspark.sql import functions as F


def test_objective_decreases_and_deterministic(spark, embeddings):
    from flatbread_spark.operators.kmeans import kmeans_lloyd

    df = embeddings.select("vec_id", "embedding")
    a1, c1 = kmeans_lloyd(df, "vec_id", "embedding", k=4, iters=1)
    a2, c2 = kmeans_lloyd(df, "vec_id", "embedding", k=4, iters=3)
    o1 = a1.agg(F.sum("d2")).first()[0]
    o2 = a2.agg(F.sum("d2")).first()[0]
    assert o2 <= o1 + 1e-9, (o1, o2)
    # deterministic under input repartitioning
    a2b, c2b = kmeans_lloyd(
        df.repartition(13), "vec_id", "embedding", k=4, iters=3
    )
    assert c2 == c2b
    assert {(r.vec_id, r.cluster) for r in a2.collect()} == {
        (r.vec_id, r.cluster) for r in a2b.collect()
    }


def test_every_vector_assigned(spark, embeddings):
    from flatbread_spark.operators.kmeans import kmeans_lloyd

    df = embeddings.select("vec_id", "embedding")
    a, cents = kmeans_lloyd(df, "vec_id", "embedding", k=3, iters=1)
    assert a.count() == df.count()
    assert a.filter((F.col("cluster") < 0) | (F.col("cluster") >= 3)).count() == 0
    assert len(cents) == 3


def test_bad_init_rejected(spark, embeddings):
    from flatbread_spark.operators.kmeans import kmeans_lloyd

    with pytest.raises(ValueError):
        kmeans_lloyd(
            embeddings, "vec_id", "embedding", k=4, iters=1, init=[[0.0] * 64]
        )


def test_null_and_ragged_vectors_null_propagate(spark):
    """The Arrow assignment kernel must null-propagate (like the expression
    path it replaced), not abort the job, on null or wrong-length vectors."""
    from flatbread_spark.operators.kmeans import _assign

    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, None), (2, [1.0] * 3)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.cluster, r.d2)
        for r in _assign(df, "embedding", [[0.0] * 4, [1.0] * 4]).collect()
    }
    assert out[0] == (0, 0.0)
    assert out[1] == (None, None)
    assert out[2] == (None, None)


def test_ragged_vectors_survive_update_step(spark):
    """ADVICE r4: a ragged vector gets cluster=NULL from the kernel but its
    dims still posexplode — the update step must drop it, not raise
    TypeError in the driver loop."""
    from flatbread_spark.operators.kmeans import kmeans_lloyd

    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [10.0] * 4), (2, [1.0] * 3), (3, None)],
        "vec_id long, embedding array<double>",
    )
    a, cents = kmeans_lloyd(df, "vec_id", "embedding", k=2, iters=2,
                            init=[[0.0] * 4, [10.0] * 4])
    out = {r.vec_id: r.cluster for r in a.collect()}
    assert out[0] == 0 and out[1] == 1
    assert out[2] is None and out[3] is None
    assert cents == [[0.0] * 4, [10.0] * 4]
