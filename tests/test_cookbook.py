"""Integration guard for the README "corpus calibration and release
mixing" cookbook: the exact composition documented there must keep
running end-to-end (operators compose on each other's output columns)."""
from pyspark.sql import functions as F


def test_calibration_mixing_cookbook(spark, documents):
    from flatbread_spark import (
        curriculum_order,
        exact_percentiles,
        field_association,
        quantile_bucketize,
        quantile_normalize,
        sample_to_mix,
        strip_boilerplate_prefix,
    )
    from flatbread_spark.functions.text import with_mojibake

    docs = documents.withColumn(
        "quality", (F.col("n_chars") % 97).cast("bigint")
    )
    clean = strip_boilerplate_prefix(
        docs, "source", "text", prefix_len=48, min_docs=20
    )
    gated = with_mojibake(clean, "clean_text").filter("mojibake_per_10k < 50")
    audit = field_association(gated, "lang", "source")
    p = exact_percentiles(
        gated, "n_chars", "doc_id", [10_000, 500_000, 990_000]
    )
    comparable = quantile_normalize(
        gated.select("doc_id", "lang", "source", "quality"),
        "source", "quality", "doc_id",
    )
    mixed = sample_to_mix(
        comparable, "doc_id", "lang",
        {"en": 600_000, "de": 200_000, "fr": 200_000},
    )
    tiers = quantile_bucketize(mixed, "norm_score", "doc_id", 10)
    ordered = curriculum_order(
        tiers, "doc_id", F.col("bucket").cast("int") - 1
    )

    n_mixed = mixed.count()
    assert n_mixed > 0
    assert ordered.count() == n_mixed
    assert audit.count() > 0 and p.count() == 3
    # the mix recipe holds: equal targets keep equal counts, and the en
    # share is 3x up to the integer-floor slack (< 1 row per group)
    counts = {
        r["lang"]: r["n"]
        for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["de"] == counts["fr"]
    assert abs(counts["en"] - 3 * counts["de"]) <= 3
    # curriculum positions are dense 1..n
    pos = sorted(r["train_pos"] for r in ordered.select("train_pos").collect())
    assert pos == list(range(1, n_mixed + 1))
