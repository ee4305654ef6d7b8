"""int8 quantization: code bounds, reconstruction error bound, zero-vector."""
from pyspark.sql import functions as F


def _quant(df):
    from flatbread_spark.functions.vectors import (
        dequant_rmse_exact,
        int8_codes,
        int8_scale,
    )

    staged = df.withColumn("scale", int8_scale(F.col("embedding"))).withColumn(
        "codes", int8_codes(F.col("embedding"), F.col("scale"))
    )
    return staged.withColumn(
        "rmse", dequant_rmse_exact(F.col("embedding"), F.col("codes"), F.col("scale"))
    )


def test_codes_bounded_and_error_within_half_step(embeddings):
    out = _quant(embeddings.select("vec_id", "embedding")).select(
        "vec_id",
        "scale",
        "rmse",
        F.array_max("codes").alias("cmax"),
        F.array_min("codes").alias("cmin"),
    )
    bad = out.filter(
        (F.col("cmax") > 127)
        | (F.col("cmin") < -127)
        # per-element error is at most scale/2, so the RMS is too
        | (F.col("rmse") > F.col("scale") * 0.5 + 1e-12)
    )
    assert bad.count() == 0
    assert out.count() == embeddings.count()


def test_zero_vector_quantizes_to_zero_codes(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id int, embedding array<float>"
    )
    row = _quant(df).first()
    assert row.scale == 0.0
    assert set(row.codes) == {0}
    assert row.rmse == 0.0
