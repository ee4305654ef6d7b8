"""Corpus-wide repeated n-gram span detection and masking.

The span-level companion to document/chunk dedup: training corpora carry
boilerplate SPANS (license headers, navigation text, templated sentences)
that repeat across documents which are otherwise unique — whole-document
and chunk-level dedup both miss them. The public technique (suffix-array
substring dedup, Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better") removes any span repeated verbatim in the
corpus. A literal distributed suffix array doesn't fit Spark's model; the
Spark-first equivalent is n-gram occurrence counting — a span repeated
k ≥ n tokens long necessarily contains repeated n-grams, so flagging all
positions covered by an n-gram with corpus count ≥ ``min_count``
identifies exactly the repeated spans of length ≥ n (with n-token
resolution at the boundaries).

Dataflow (all bounds are vocabulary/model-shaped, never pairwise):
  1. per-document n-grams with their start positions — row-local
     ``sequence`` + ``slice`` HOFs; the join key is the md5-portable HASH
     of the n-gram, so the wire carries 8-byte ints, not strings;
  2. corpus-wide occurrence count — ONE partial-aggregated shuffle
     bounded by the n-gram vocabulary (same bound, and same open-corpus
     honesty caveat, as ``pair_counts``/``ngram_jaccard``: at open-web
     scale you raise ``min_count`` and the hot set shrinks by Zipf);
  3. the hot set (count ≥ min_count) joins back to doc occurrences —
     hot sets are small by construction, so the join BROADCASTS;
  4. per-document coverage — positions covered by any hot occurrence,
     expanded row-locally (``flatten``/``sequence``/``array_distinct``)
     after a doc-keyed ``collect_list`` of hot starts (bounded by the
     document's own occurrence count).

``hot_ngram_coverage`` emits the diagnostic counts; ``mask_hot_ngrams``
additionally rebuilds the text with covered tokens removed — the actual
cleaning transform.
"""
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flatbread_spark.operators.dedup import portable_hash60


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def _gram_hash(words: Column, start: Column, n: int) -> Column:
    return portable_hash60(F.concat_ws(" ", F.slice(words, start, n)))


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, start, gh) for every n-gram occurrence; docs shorter than n
    contribute nothing. Row-local explode — the map side of everything.

    The min-length guard lives INSIDE the explode (when(...) -> NULL ->
    no rows), not as a Filter: a Filter on size(__w__) gets pushed below
    the tokenize Project, re-evaluating the split per row (the same
    Catalyst pushback the kappa operator documents). The gram HASH is
    likewise emitted from inside the Generate (a (start, gh) struct
    array) rather than a post-explode projection: downstream joins on gh
    get an optimizer-inferred isnotnull(gh) filter, and a projected gh
    would be inlined into that predicate — hashing every gram twice; a
    Generate-output attribute is referenced, not recomputed."""
    words = _tokens(F.col(text_col))
    base = df.select(F.col(id_col), words.alias("__w__"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__w__") - (n - 1)),
        lambda s: F.struct(
            s.cast("int").alias("start"),
            _gram_hash(F.col("__w__"), s, n).alias("gh"),
        ),
    )
    return base.select(
        id_col,
        F.explode(F.when(F.size("__w__") >= n, grams)).alias("__g__"),
    ).select(id_col, F.col("__g__.start").alias("start"), F.col("__g__.gh").alias("gh"))


def hot_ngram_hashes(
    df: DataFrame, text_col: str, n: int = 8, min_count: int = 2,
    id_col: str = "__hot_id__",
) -> DataFrame:
    """The hot set: hashes of n-grams occurring ≥ min_count times in the
    corpus (occurrences, not distinct documents — a span repeated three
    times inside one page is boilerplate too). One vocabulary-bounded
    shuffle."""
    tagged = df.select(F.monotonically_increasing_id().alias(id_col), text_col)
    return (
        _doc_grams(tagged, id_col, text_col, n)
        .groupBy("gh")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
    )


def hot_ngram_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_count: int = 2,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Per-document repeated-span diagnostics: ``n_tokens``, ``n_covered``
    (token positions inside at least one hot n-gram occurrence), and
    ``n_hot_occ`` (hot occurrences in the document) — all BIGINT.

    ``hot`` — optionally a precomputed/persisted hot set (from
    :func:`hot_ngram_hashes`, e.g. built once for a corpus release and
    reused across batches); defaults to building it from ``df`` itself.
    """
    grams = _doc_grams(df, id_col, text_col, n)
    if hot is None:
        hot = grams.groupBy("gh").agg(F.count("*").alias("n_occ")).filter(
            F.col("n_occ") >= min_count
        )
    hits = grams.join(F.broadcast(hot.select("gh")), "gh")
    per_doc = hits.groupBy(id_col).agg(
        F.collect_list("start").alias("__starts__"),
        F.count("*").cast("bigint").alias("n_hot_occ"),
    )
    covered = F.size(
        F.array_distinct(
            F.flatten(
                F.transform(
                    "__starts__", lambda s: F.sequence(s, s + (n - 1))
                )
            )
        )
    ).cast("bigint")
    words = _tokens(F.col(text_col))
    return (
        df.select(F.col(id_col), F.size(words).cast("bigint").alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(covered, F.lit(0).cast("bigint")).alias("n_covered"),
            F.coalesce("n_hot_occ", F.lit(0).cast("bigint")).alias("n_hot_occ"),
        )
    )


def mask_hot_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_count: int = 2,
    hot: DataFrame | None = None,
    out_col: str = "masked_text",
) -> DataFrame:
    """Rebuild each document with every hot-covered token removed — the
    cleaning counterpart of :func:`hot_ngram_coverage`. The rebuild is
    row-local: covered positions expand from the doc's own hot starts and
    the keep-filter runs inside the scan stage (O(tokens × covered)
    membership scans, bounded by document length)."""
    grams = _doc_grams(df, id_col, text_col, n)
    if hot is None:
        hot = grams.groupBy("gh").agg(F.count("*").alias("n_occ")).filter(
            F.col("n_occ") >= min_count
        )
    hits = grams.join(F.broadcast(hot.select("gh")), "gh")
    per_doc = hits.groupBy(id_col).agg(
        F.array_distinct(
            F.flatten(
                F.collect_list(F.sequence(F.col("start"), F.col("start") + (n - 1)))
            )
        ).alias("__cov__")
    )
    words = _tokens(F.col(text_col))
    kept = F.filter(
        F.transform(words, lambda w, i: F.struct(w.alias("w"), (i + 1).alias("p"))),
        lambda s: ~F.coalesce(
            F.array_contains(F.col("__cov__"), s["p"]), F.lit(False)
        ),
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn(out_col, F.concat_ws(" ", F.transform(kept, lambda s: s["w"])))
        .drop("__cov__")
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-document n-gram NOVELTY: what fraction (ppm) of a document's
    DISTINCT n-grams appear in no other document — the diversity /
    memorization-risk score dual to :func:`hot_ngram_coverage` (coverage
    asks "how much of this doc is repeated material"; novelty asks "how
    much of this doc exists nowhere else"). Low-novelty documents are
    near-verbatim recombinations of corpus material even when no single
    pair-wise dedup fires; high-novelty documents carry unique content
    worth keeping under a token budget.

    Dataflow: distinct (doc, gram-hash) pairs — deduplicated ROW-LOCALLY
    with ``array_distinct`` before the explode, so a gram repeated inside
    one document costs one wire row; document count per gram is then a
    plain ``count`` over the distinct pairs (one vocabulary-bounded
    partial-aggregated shuffle); the join back carries (id, 8-byte hash)
    pairs — content never moves. All counting is BIGINT;
    ``novelty_ppm = n_unique * 1_000_000 div n_grams`` is byte-identical
    across engines. Documents with fewer than ``n`` tokens have no
    n-grams and are omitted (score undefined, not zero).

    Returns ``(id_col, n_grams, n_unique, novelty_ppm)`` — all BIGINT.
    """
    words = _tokens(F.col(text_col))
    base = df.select(F.col(id_col), words.alias("__w__"))
    # min-length guard inside the explode, not a Filter — see _doc_grams
    ghs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("__w__") - (n - 1)),
            lambda s: _gram_hash(F.col("__w__"), s, n),
        )
    )
    pairs = base.select(
        id_col,
        F.explode(F.when(F.size("__w__") >= n, ghs)).alias("gh"),
    )
    gram_docs = pairs.groupBy("gh").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        pairs.join(gram_docs, "gh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("n_docs") == 1).cast("bigint"))
            .cast("bigint")
            .alias("n_unique"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("n_unique * CAST(1000000 AS BIGINT) div n_grams").cast(
                "bigint"
            ),
        )
    )
