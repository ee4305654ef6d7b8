"""Per-source boilerplate PREFIX detection and stripping.

Web-corpus pages from one site share injected headers ("subscribe to our
newsletter | cookie notice | ..."): a fixed prefix prepended to otherwise
unique articles. Whole-document dedup keeps every page (bodies differ);
repeated-span masking (``spans.py``) catches the tokens but needs the
n-gram vocabulary shuffle. This operator is the cheap targeted pass: a
prefix shared by ≥ ``min_docs`` documents OF THE SAME SOURCE is
boilerplate, and stripping it is a row-local ``substring``.

Scale shape — content NEVER moves:
  1. per document, the md5 hash of its first ``prefix_len`` characters —
     row-local; documents shorter than ``prefix_len`` are exempt (their
     "prefix" is the whole text; stripping would empty them);
  2. count per (source, prefix-hash) — ONE partial-aggregated shuffle of
     (source, 8-byte hash) pairs, bounded by the number of DISTINCT
     prefixes, not documents;
  3. the flagged set (count ≥ min_docs) is small BY CONSTRUCTION
     (boilerplate means many docs per entry — |flags| ≤ |docs|/min_docs,
     and in practice a handful per source), so it broadcasts and the
     strip decision is a broadcast-hash-join against row-locally
     recomputed keys: zero shuffle of text, zero shuffle of anything
     document-sized.

The decision key is (source, prefix) — the same prefix appearing on two
different sources does NOT pool across them (two sites sharing a CMS
header each need min_docs of their own), matching how per-site cleaning
rules are actually maintained.
"""
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_prefixes(
    df: DataFrame,
    group_col: str,
    text_col: str,
    prefix_len: int = 40,
    min_docs: int = 5,
) -> DataFrame:
    """The flagged set: ``(group, prefix_hash, n_docs)`` for every exact
    ``prefix_len``-char prefix shared by ≥ ``min_docs`` documents within a
    group. One vocabulary-bounded shuffle; reusable across batches (build
    once per corpus release, pass into :func:`strip_boilerplate_prefix`)."""
    if prefix_len < 1 or min_docs < 2:
        raise ValueError(
            f"need prefix_len >= 1 and min_docs >= 2, got {prefix_len}, {min_docs}"
        )
    eligible = df.filter(F.length(F.col(text_col)) > prefix_len)
    key = F.md5(F.substring(F.col(text_col), 1, prefix_len))
    return (
        eligible.select(F.col(group_col), key.alias("prefix_hash"))
        .groupBy(group_col, "prefix_hash")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_prefix(
    df: DataFrame,
    group_col: str,
    text_col: str,
    prefix_len: int = 40,
    min_docs: int = 5,
    flags: DataFrame | None = None,
    out_col: str = "clean_text",
) -> DataFrame:
    """Strip flagged boilerplate prefixes; append ``is_boilerplate``
    (boolean) and ``out_col`` (the text minus the first ``prefix_len``
    characters when flagged, left-trimmed so the cut never leaves leading
    separators; unchanged otherwise).

    ``flags`` — optionally a precomputed set from
    :func:`boilerplate_prefixes`; defaults to building it from ``df``.
    The join is a broadcast against the small flag set keyed on the
    row-locally recomputed (group, prefix-hash): text never shuffles.
    """
    if flags is None:
        flags = boilerplate_prefixes(df, group_col, text_col, prefix_len, min_docs)
    key = F.when(
        F.length(F.col(text_col)) > prefix_len,
        F.md5(F.substring(F.col(text_col), 1, prefix_len)),
    )
    flagged = df.withColumn("__bp__", key).join(
        F.broadcast(
            flags.select(
                group_col,
                F.col("prefix_hash").alias("__bp__"),
                F.lit(True).alias("__hit__"),
            )
        ),
        [group_col, "__bp__"],
        "left",
    )
    is_boiler = F.coalesce(F.col("__hit__"), F.lit(False))
    return (
        flagged.withColumn("is_boilerplate", is_boiler)
        .withColumn(
            out_col,
            F.when(
                is_boiler,
                F.ltrim(F.expr(f"substring({text_col}, {int(prefix_len) + 1})")),
            ).otherwise(F.col(text_col)),
        )
        .drop("__bp__", "__hit__")
    )
