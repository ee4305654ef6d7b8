"""Hashed bag-of-ngrams linear classifier scoring (fastText-style).

The standard public architecture for corpus quality filters (fastText's
hashed-feature linear model, as used by CCNet-style pipelines): each
document becomes a bag of hashed unigram+bigram buckets, the score is the
sum of per-bucket weights, and the filter keeps documents over a
threshold. This module implements the SCORING side at corpus scale; the
weights come either from a trained model (any (bucket, weight) table) or
from the deterministic hash-derived demo weights used by the graded query.

Two execution paths, chosen by whether a weights DataFrame is supplied:

* ``weights=None`` — weights are derived per-bucket from the portable md5
  hash (integer in [-1000, 1000]). The whole score is then ONE row-local
  expression chain (``split`` → ``transform``/``zip_with`` →
  ``aggregate``): zero shuffle, zero Python, integer arithmetic end to
  end — which is what makes the query value-hash reproducible in SQL.
* ``weights=DataFrame(bucket, weight)`` — features are exploded and
  equi-joined against the weights table. The model is bucket-bounded
  (``n_buckets`` rows max), so Spark broadcasts it under AQE and the only
  shuffle is the per-document re-aggregation. At 100 TB the explode is
  map-side and the shuffle carries (id, partial-sum) after partial
  aggregation — bytes proportional to documents, not tokens.

Beyond-reference operator (SURVEY §2.9); no flatbread counterpart.
"""
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flatbread_spark.operators.dedup import portable_hash60


def hashed_bucket(s: Column, n_buckets: int, salt: str = "") -> Column:
    """Feature-hash a token (or ngram string) to a bucket id in
    [0, n_buckets): portable md5-derived 60-bit hash, modulo. Non-negative
    by construction, so the modulo is engine-agnostic."""
    return portable_hash60(F.concat(F.lit(salt), s)) % n_buckets


def pseudo_weight(bucket: Column, lo: int = -1000, hi: int = 1000) -> Column:
    """Deterministic integer weight for a bucket id, uniform on [lo, hi]:
    md5 of 'w#<bucket>'. Stands in for a trained weight vector so the
    scoring plan is testable/gradable without shipping a model."""
    span = hi - lo + 1
    return (
        portable_hash60(F.concat(F.lit("w#"), bucket.cast("string"))) % span + lo
    )


def hashed_features(
    text_col: str | Column,
    n_buckets: int = 1 << 16,
    salt: str = "",
    include_bigrams: bool = True,
) -> Column:
    """Array of hashed feature buckets for a text column: lowercase
    whitespace unigrams plus (optionally) adjacent-word bigrams — the
    fastText wordNgrams=2 feature set. Pure row-local array expressions."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.trim(F.lower(col)), r"\s+")
    uni = F.transform(words, lambda w: hashed_bucket(w, n_buckets, salt))
    if not include_bigrams:
        return uni
    n = F.size(words)
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: hashed_bucket(
                F.concat(a, F.lit(" "), b), n_buckets, salt
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, big)


def score_hashed_linear(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame | None = None,
    n_buckets: int = 1 << 16,
    salt: str = "",
    include_bigrams: bool = True,
    threshold: float = 0,
    append: bool = False,
) -> DataFrame:
    """Score every document with a hashed linear model.

    Output: ``id_col``, ``n_feats`` (bigint), ``logit`` (bigint for the
    hash-derived demo weights, double for a supplied model), ``keep``
    (logit > threshold).

    ``weights`` — optional DataFrame with columns ``bucket`` (bigint) and
    ``weight``; missing buckets score 0 (left join), matching fastText's
    dense-vector lookup of an all-buckets model.

    ``append=True`` keeps ALL input columns and appends the three score
    columns — the single-pass composition hook for gate stacking (e.g.
    classifier gate over a frame that already carries Gopher flags, so
    agreement checks read ONE scan instead of two scans + a join). In the
    demo-weights path this is the same zero-shuffle expression chain; with
    a supplied model it joins the per-id scores back on ``id_col`` (the
    explode/re-agg still needs its own keyed aggregate).
    """
    feats = hashed_features(text_col, n_buckets, salt, include_bigrams)
    if append and weights is None:
        return (
            df.withColumn("__fb__", feats)
            .withColumn("n_feats", F.size("__fb__").cast("bigint"))
            .withColumn(
                "logit",
                F.aggregate(
                    "__fb__",
                    F.lit(0).cast("bigint"),
                    lambda acc, b: acc + pseudo_weight(b),
                ),
            )
            .drop("__fb__")
            .withColumn("keep", F.col("logit") > F.lit(threshold))
        )
    base = df.select(F.col(id_col), feats.alias("__fb__"))
    if weights is None:
        scored = base.select(
            id_col,
            F.size("__fb__").cast("bigint").alias("n_feats"),
            F.aggregate(
                "__fb__",
                F.lit(0).cast("bigint"),
                lambda acc, b: acc + pseudo_weight(b),
            ).alias("logit"),
        )
    else:
        exploded = base.select(
            id_col, F.size("__fb__").cast("bigint").alias("n_feats"),
            F.explode_outer("__fb__").alias("bucket"),
        )
        scored = (
            exploded.join(F.broadcast(weights), "bucket", "left")
            .groupBy(id_col, "n_feats")
            .agg(
                F.coalesce(F.sum("weight"), F.lit(0.0)).cast("double").alias(
                    "logit"
                )
            )
        )
    scored = scored.withColumn("keep", F.col("logit") > F.lit(threshold))
    if append:
        return df.join(scored, id_col)
    return scored
