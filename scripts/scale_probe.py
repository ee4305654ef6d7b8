#!/usr/bin/env python
"""Reproducible 10× scaling probe behind the SCALE.md table.

Replicates the sf0.1 corpus 10× (each source doc becomes a 10-way
near-dup cluster via per-copy token prefixes — deliberately adversarial
near-dup density) and the embedding corpus 10× (distinct ids), then times
each headline operator at 1× and 10×. Near-linear time in input despite
output growing quadratically in cluster size is the pass criterion — the
banding/bucketing joins, not the pair emission, must set the cost.

Usage: python scripts/scale_probe.py [op ...]   (default: all)
Writes one JSON line per op: {"op": ..., "t1": ..., "t10": ..., "ratio": ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import flatbread_spark as fb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus_10x(docs):
    """10 near-dup copies per doc: copy i prefixes the text with i tokens
    so copies are near- (not exact-) duplicates; doc_ids stay distinct.
    n_chars is recomputed for the lengthened replicas."""
    max_id = docs.agg(F.max("doc_id")).first()[0]
    assert max_id < 1_000_000, (
        f"doc_id replication offset collides (max doc_id {max_id}); "
        "raise the offset for this corpus"
    )
    parts = [docs]
    for i in range(1, 10):
        text = F.concat(F.lit(("pad%d " % i) * i), F.col("text"))
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                text.alias("text"),
                "lang", "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def emb_10x(emb):
    max_id = emb.agg(F.max("vec_id")).first()[0]
    assert max_id < 100_000, (
        f"vec_id replication offset collides (max vec_id {max_id}); "
        "raise the offset for this corpus"
    )
    parts = [emb]
    for i in range(1, 10):
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 100_000)).alias("vec_id"),
                "embedding", "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _funnel(d):
    from flatbread_spark.functions.text import mean_token_len, quality_score, tokens

    toks = tokens(F.col("text"))
    nw = F.size(toks)
    mwl = mean_token_len(F.col("text"))
    pfx = F.md5(F.concat_ws(" ", F.slice(toks, 1, 8)))
    return fb.curation_funnel(
        d.select("doc_id", "lang", "text"),
        key_col="doc_id",
        pre_stages=[
            ("lang", F.col("lang").isin("en", "de", "fr")),
            ("word_count", (nw >= 20) & (nw <= 100_000)),
            ("mean_word_len", (mwl >= 3.0) & (mwl <= 10.0)),
        ],
        dedup_on=pfx,
        dedup_name="dup_prefix",
        post_stages=[("quality", quality_score(F.col("text")) >= 0.5)],
    )


def _sketch_merge_tree(d):
    from flatbread_spark.operators.sketches import sketch_merge_check

    return sketch_merge_check(d.select("doc_id"), "doc_id", n_shards=16)


def main():
    spark = fb.get_spark(app="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding", "label"
    )
    docs1 = docs.localCheckpoint(eager=True)
    docs10 = corpus_10x(docs).repartition(32).localCheckpoint(eager=True)
    emb1 = emb.localCheckpoint(eager=True)
    emb10 = emb_10x(emb).repartition(32).localCheckpoint(eager=True)

    # round-8 probes ride the docs slot; helpers below derive their inputs
    def _pseudo_names(d):
        # last two tokens: the pad-prefix replication leaves suffixes
        # unchanged, so the distinct-name vocabulary is IDENTICAL at 1x
        # and 10x — which is the linkage scale claim under test (cost
        # follows the vocabulary, not the row count)
        toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        return d.select(F.concat_ws(" ", F.slice(toks, -2, 2)).alias("pname"))

    def _versioned(d):
        return d.select(
            F.col("doc_id").alias("k"),
            F.xxhash64("text").alias("content"),
            F.lit(1).cast("bigint").alias("version"),
        )

    def _with_urls(d):
        # synthetic dirty URLs keyed off doc_id/source — 10x replication
        # multiplies collisions per canonical URL, which is exactly the
        # reduce-side growth url_dedup must absorb map-side
        return d.select(
            "doc_id",
            "n_chars",
            F.concat(
                F.lit("HTTP://WWW."),
                F.col("source"),
                F.lit("-"),
                (F.col("doc_id") % 97).cast("string"),
                F.lit(".Example.COM:80/p/"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("/?utm_source=x&b=2&a=1#f"),
            ).alias("url"),
        )

    def run_count(df_out):
        return df_out.count()

    OPS = {
        "dedup_exact": lambda d, e: run_count(
            fb.dedup_exact(d, "doc_id", "text")
        ),
        "minhash_lsh_pairs": lambda d, e: run_count(
            fb.minhash_lsh_pairs(d, "doc_id", "text")
        ),
        "simhash_pairs": lambda d, e: run_count(
            fb.simhash_pairs(d, "doc_id", "text")
        ),
        "pack_sequences": lambda d, e: run_count(
            fb.pack_sequences(
                d,
                key_col="doc_id",
                tokens_col=F.size(F.split(F.trim(F.col("text")), r"\s+")),
                ctx_len=2048,
            )
        ),
        "curation_funnel": lambda d, e: run_count(_funnel(d)),
        "trigram_typicality": lambda d, e: run_count(
            fb.trigram_typicality(d, "doc_id", "text", "lang")
        ),
        "kmeans_lloyd": lambda d, e: run_count(
            fb.kmeans_lloyd(e, "vec_id", "embedding", k=8, iters=2)[0]
        ),
        "pair_counts": lambda d, e: run_count(fb.pair_counts(d, "text")),
        "char_entropy": lambda d, e: run_count(
            fb.char_entropy(d, "doc_id", "text")
        ),
        # round-6 operators
        "sample_weighted": lambda d, e: run_count(
            fb.sample_weighted(d, "doc_id", "n_chars", 500)
        ),
        "approx_topk_tokens": lambda d, e: run_count(
            fb.approx_topk_tokens(d, "text", k=25, width=2048)
        ),
        "chunk_self_dedup": lambda d, e: run_count(
            fb.chunk_self_dedup(d, "doc_id", "text")
        ),
        "pmi_bigrams": lambda d, e: run_count(
            fb.pmi_bigrams(d, "text", min_count=5, top_n=100)
        ),
        "covariance_matrix": lambda d, e: run_count(
            fb.covariance_matrix(e, "embedding", 64)
        ),
        "mine_contrastive_negatives": lambda d, e: run_count(
            fb.mine_contrastive_negatives(
                e, e.filter(F.col("vec_id") % 100 == 0), k_hard=3, n_rand=2
            )
        ),
        # round-7 operators
        "chunk_windows": lambda d, e: run_count(
            fb.chunk_windows(d, "doc_id", "text", 24, 16)
        ),
        "score_hashed_linear": lambda d, e: run_count(
            fb.score_hashed_linear(d, "doc_id", "text", n_buckets=65536)
        ),
        "bloom_build_check": lambda d, e: run_count(
            fb.bloom_check(
                d.select(F.md5("text").alias("key")),
                "key",
                fb.bloom_build(
                    d.filter(F.col("doc_id") % 3 != 0).select(
                        F.md5("text").alias("key")
                    ),
                    "key",
                    1 << 20,
                ),
                1 << 20,
            )
        ),
        "vocab_coverage": lambda d, e: run_count(
            fb.vocab_coverage(
                d, "doc_id", "text", fb.top_vocab(d, "text", 1000)
            )
        ),
        # NOTE: the 10× replica corpus is adversarial for hot_ngram
        # coverage on purpose — every doc is 10-way near-duplicated, so
        # almost every trigram goes hot and the hot set approaches the
        # full gram vocabulary (min_count would be raised at real scale).
        "hot_ngram_coverage": lambda d, e: run_count(
            fb.hot_ngram_coverage(d, "doc_id", "text", n=3, min_count=5)
        ),
        # round-8 operators
        "merge_upsert": lambda d, e: run_count(
            fb.merge_upsert(
                _versioned(d),
                _versioned(d.filter(F.col("doc_id") % 3 == 0)).withColumn(
                    "version", F.lit(2).cast("bigint")
                ),
                ["k"],
                "version",
            )
        ),
        "snapshot_diff": lambda d, e: run_count(
            fb.snapshot_diff_summary(
                _versioned(d),
                _versioned(d.filter(F.col("doc_id") % 5 != 0)).withColumn(
                    "content",
                    F.when(
                        F.col("k") % 7 == 0, F.col("content") + 1
                    ).otherwise(F.col("content")),
                ),
                ["k"],
            )
        ),
        "gap_fill": lambda d, e: run_count(
            fb.gap_fill(
                # synthetic per-lang ordinal stream: doc_id as the clock,
                # bucket width 16 ids; spine span scales with the id range
                d.select("lang", "doc_id", "n_chars"),
                ["lang"],
                "doc_id",
                16,
                {"n": F.count(F.lit(1)), "v": F.sum("n_chars")},
                fill=["v"],
            )
        ),
        "fuzzy_match_pairs": lambda d, e: run_count(
            fb.fuzzy_match_pairs(_pseudo_names(d), "pname", 2)
        ),
        # round-9 operators: URL family over a synthetic dirty-URL column,
        # skew profile + domain cap over the replicated corpus
        "url_dedup": lambda d, e: run_count(
            fb.dedup_by_url(_with_urls(d), "url", "doc_id", "n_chars")
        ),
        "skew_profile": lambda d, e: run_count(
            fb.skew_profile(d, ["lang"], top_k=10)
        ),
        "domain_cap_sample": lambda d, e: run_count(
            fb.sample_domain_capped(d, "doc_id", "source", 30_000)
        ),
        # round-10 operators
        "join_estimate": lambda d, e: run_count(
            fb.join_estimate(d, d, ["lang"], top_k=10)
        ),
        "rate_anomaly": lambda d, e: run_count(
            # doc_id as an ordinal clock, 64-id buckets per lang
            fb.rate_anomaly(
                d.select("lang", "doc_id"), ["lang"], "doc_id", 64,
                trailing=3, factor_x1000=2000, min_count=4,
            )
        ),
        "label_vote": lambda d, e: run_count(
            fb.label_vote(d, "source", "lang")
        ),
        # round-11 operators
        "curriculum_order": lambda d, e: run_count(
            fb.curriculum_order(
                d.select("doc_id", "n_chars"),
                "doc_id",
                F.when(F.col("n_chars") >= 800, 0)
                .when(F.col("n_chars") >= 400, 1)
                .otherwise(2),
            )
        ),
        # prefix fingerprints so the 10x near-dup replicas collide by
        # construction (full-text dups don't exist in this corpus)
        "dup_source_matrix": lambda d, e: run_count(
            fb.dup_source_matrix(
                d.withColumn(
                    "__pre",
                    F.concat_ws(
                        " ", F.slice(F.split(F.trim(F.col("text")), " "), 1, 3)
                    ),
                ),
                "doc_id",
                "__pre",
                "source",
            )
        ),
        # batch = every 10th doc, corpus = the rest; the 10x replicas give
        # every batch doc ~10 corpus near-dups — reduce-side candidate
        # growth the banding must absorb
        "minhash_probe": lambda d, e: run_count(
            fb.minhash_probe(
                d.filter(F.col("doc_id") % 10 == 0),
                d.filter(F.col("doc_id") % 10 != 0),
                "doc_id", "text", n=4, num_hashes=32, bands=8,
            )
        ),
        # round-12 operators
        "quantile_bucketize": lambda d, e: run_count(
            fb.quantile_bucketize(
                d.select("doc_id", "n_chars"), "n_chars", "doc_id", 10
            )
        ),
        "exact_percentiles": lambda d, e: run_count(
            fb.exact_percentiles(
                d.select("doc_id", "n_chars"), "n_chars", "doc_id",
                [10_000, 500_000, 990_000],
            )
        ),
        # the 10x pad-prefix replicas make every replica family share a
        # source and a first-40-chars key only within the same pad count,
        # so flag-set growth tracks DISTINCT prefixes — the claimed bound
        "strip_boilerplate": lambda d, e: run_count(
            fb.strip_boilerplate_prefix(d, "source", "text", 40, 5)
        ),
        # NOTE: like hot_ngram_coverage, the 10x near-dup corpus is
        # adversarial — replicas share almost all grams, so n_unique
        # collapses; cost must still follow the gram vocabulary
        "ngram_novelty": lambda d, e: run_count(
            fb.ngram_novelty(d, "doc_id", "text", n=5)
        ),
        "knn_quantized": lambda d, e: run_count(
            fb.knn_quantized(
                e, e.filter(F.col("vec_id") % 1000 == 0), k=5, shortlist=20
            )
        ),
        "sample_to_mix": lambda d, e: run_count(
            fb.sample_to_mix(
                d.select("doc_id", "lang"), "doc_id", "lang",
                {"en": 600_000, "de": 200_000, "fr": 200_000},
            )
        ),
        "quantile_normalize": lambda d, e: run_count(
            fb.quantile_normalize(
                d.select("doc_id", "source", "n_chars"),
                "source", "n_chars", "doc_id",
            )
        ),
        # round-13 operators
        "mojibake": lambda d, e: run_count(
            __import__(
                "flatbread_spark.functions.text", fromlist=["with_mojibake"]
            ).with_mojibake(d.select("doc_id", "text"), "text")
        ),
        "field_association": lambda d, e: run_count(
            fb.field_association(d, "lang", "source")
        ),
        "winsorize": lambda d, e: run_count(
            fb.winsorize(
                d.select("doc_id", "n_chars"), "n_chars", "doc_id",
                50_000, 950_000,
            )
        ),
        "lang_segments": lambda d, e: run_count(
            __import__(
                "flatbread_spark.functions.text", fromlist=["with_lang_segments"]
            ).with_lang_segments(d.select("doc_id", "text"), "doc_id", "text", 20)
        ),
        "group_percentiles": lambda d, e: run_count(
            fb.group_percentiles(
                d.select("doc_id", "lang", "n_chars"), "lang", "n_chars",
                "doc_id", [50_000, 500_000, 990_000],
            )
        ),
        "standardize": lambda d, e: run_count(
            fb.standardize(
                d.select("doc_id", "lang", "n_chars"), "lang", "n_chars"
            )
        ),
        # documents stand in for events: per-source doc stream ordered by
        # doc_id, state = lang — same shape (per-key window + pair agg)
        "event_transitions": lambda d, e: run_count(
            fb.event_transitions(
                d.select("source", "doc_id", "lang"),
                "source", "doc_id", "lang",
            )
        ),
        "session_paths": lambda d, e: run_count(
            fb.session_paths(
                d.select("source", "doc_id", "lang"),
                "source", "doc_id", "lang", k=3,
            )
        ),
        # key = doc_id div 10 gives many small "users" (the scale shape:
        # key count grows with input, per-key state stays bounded)
        "conversion_lag": lambda d, e: run_count(
            fb.conversion_lag(
                d.select(
                    (F.col("doc_id") / 10).cast("bigint").alias("k"),
                    "doc_id", "lang",
                ),
                "k", "doc_id", "lang", "en", "de",
            )
        ),
        "rolling_counts": lambda d, e: run_count(
            fb.rolling_counts(
                d.select(
                    (F.col("doc_id") % 1000).alias("k"),
                    "doc_id", "n_chars",
                ),
                "k", "doc_id", window=5000, value_col="n_chars",
            )
        ),
        "vocab_overlap": lambda d, e: run_count(
            fb.vocab_overlap(d.select("source", "text"), "source", "text")
        ),
        "gini_concentration": lambda d, e: run_count(
            fb.gini_concentration(
                d.select("source", "doc_id", "n_chars"),
                "source", "n_chars", "doc_id",
            )
        ),
        "characteristic_terms": lambda d, e: run_count(
            fb.characteristic_terms(
                d.select("source", "text"), "source", "text",
                k=5, min_count=5,
            )
        ),
        "doc_freq_spectrum": lambda d, e: run_count(
            fb.doc_freq_spectrum(d.select("doc_id", "text"), "doc_id", "text")
        ),
        "coreset_fps": lambda d, e: run_count(
            fb.fps_select(e, "vec_id", "embedding", k=8)
        ),
        "mmr_rerank": lambda d, e: run_count(
            fb.mmr_rerank(
                e, e.filter(F.col("vec_id") < 3),
                k_candidates=20, n_select=5,
            )
        ),
        "weighted_percentiles": lambda d, e: run_count(
            fb.weighted_percentiles(
                d.select(
                    "doc_id", "n_chars",
                    F.size(F.split(F.trim("text"), r"\s+"))
                    .cast("bigint").alias("w"),
                ),
                "n_chars", "w", "doc_id",
                [250_000, 500_000, 990_000],
            )
        ),
        "k_anonymity": lambda d, e: run_count(
            fb.k_anonymity(
                d.select("lang", "source", "n_chars"),
                ["lang", "source"], k=5, sensitive_col="n_chars",
            )
        ),
        "rolling_median": lambda d, e: run_count(
            fb.rolling_median(
                d.groupBy(
                    "source",
                    (F.col("doc_id") % 60).cast("bigint").alias("x"),
                ).agg(F.count(F.lit(1)).cast("bigint").alias("y")),
                "source", "x", "y", 7,
            )
        ),
        # supplier-co-supply stand-in: docs sharing a (doc_id div 8) block
        "triangle_count": lambda d, e: run_count(
            fb.triangle_count(
                d.select(
                    (F.col("doc_id") % 500).alias("s1"),
                    ((F.col("doc_id") * 7 + 3) % 500).alias("s2"),
                ),
                "s1", "s2",
            )
        ),
        "degree_spectrum": lambda d, e: run_count(
            fb.degree_spectrum(
                d.select(
                    (F.col("doc_id") % 500).alias("s1"),
                    ((F.col("doc_id") * 7 + 3) % 500).alias("s2"),
                ),
                "s1", "s2",
            )
        ),
        # doc_id ranges as intervals keyed by source: typical-width spans
        "interval_join": lambda d, e: run_count(
            fb.interval_join(
                d.select("source", F.col("doc_id").alias("lid"),
                         F.col("doc_id").alias("ls"),
                         (F.col("doc_id") + 8).alias("le")),
                d.select("source", F.col("doc_id").alias("rid"),
                         (F.col("doc_id") + 4).alias("rs"),
                         (F.col("doc_id") + 12).alias("re")),
                ["source"], "lid", "ls", "le", "rid", "rs", "re",
                bucket_width=8,
            )
        ),
        "tvd_drift": lambda d, e: run_count(
            fb.tvd_drift(
                d.filter(F.col("source") == "src1").select("lang"),
                d.filter(F.col("source") == "src2").select("lang"),
                "lang",
            )
        ),
        "scd2_intervals": lambda d, e: run_count(
            fb.scd2_intervals(
                d.select("source", "doc_id", "lang"), "source", "doc_id"
            )
        ),
        "ks_drift": lambda d, e: run_count(
            fb.ks_drift(
                d.filter(F.col("lang") == "en").select("n_chars"),
                d.filter(F.col("lang") == "de").select("n_chars"),
                "n_chars",
            )
        ),
        "sample_exact_n": lambda d, e: run_count(
            fb.sample_exact_n(d.select("doc_id", "source"), "doc_id", 100)
        ),
        # per-source daily-ish series: bucket doc_id, count docs per bucket
        "trend_slopes": lambda d, e: run_count(
            fb.theil_sen(
                d.groupBy(
                    "source",
                    (F.col("doc_id") % 60).cast("bigint").alias("x"),
                ).agg(F.count(F.lit(1)).cast("bigint").alias("y")),
                "source", "x", "y",
            )
        ),
        # round-7 probes (VERDICT r6 #6): the r6 tail operators under
        # adversarial shapes
        # HLL union tree at 16 shards: cost must follow the key scan, not
        # the (fixed-size) sketch merge
        "sketch_merge_tree": lambda d, e: run_count(
            _sketch_merge_tree(d)
        ),
        # interval-length skew bomb: 0.1% of left intervals cover 4000
        # buckets — just under the 4096 max_buckets_per_row guard; the
        # banded join must absorb the explode linearly, not quadratically
        "interval_join_skew": lambda d, e: run_count(
            fb.interval_join(
                d.select(
                    "source", F.col("doc_id").alias("lid"),
                    F.col("doc_id").alias("ls"),
                    (F.col("doc_id") + F.when(
                        F.col("doc_id") % 1000 == 0, 32_000
                    ).otherwise(8)).alias("le"),
                ),
                d.select("source", F.col("doc_id").alias("rid"),
                         (F.col("doc_id") + 4).alias("rs"),
                         (F.col("doc_id") + 12).alias("re")),
                ["source"], "lid", "ls", "le", "rid", "rs", "re",
                bucket_width=8,
            )
        ),
        # FPS at 8x the baseline k: together with the coreset_fps row this
        # separates the two cost axes — wall vs k (k sequential scans, so
        # ~linear in k at fixed input) and wall vs input at fixed k
        "coreset_fps_k64": lambda d, e: run_count(
            fb.fps_select(e, "vec_id", "embedding", k=64)
        ),
        # round-15 operators
        # CMS over the full token stream: shuffle is bounded at
        # depth×width×partitions by map-side combine, so 10x input should
        # cost ~the token scan, and the cell count stays ≤ d×w
        "cms_build": lambda d, e: run_count(
            fb.cms_build(
                d.select(
                    F.explode(
                        F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                    ).alias("k")
                ),
                "k", depth=4, width=256,
            )
        ),
        # adversarial for containment on purpose: every doc is a 10-way
        # near-dup family sharing its whole suffix, so each family is
        # ~45 high-containment pairs; candidate growth must stay
        # family-quadratic (bounded), never corpus-quadratic. The
        # hot-shingle cap is exercised live (family-shared shingles have
        # df≈10; cross-family boilerplate above 64 is dropped from
        # candidate generation only).
        "containment_pairs": lambda d, e: run_count(
            fb.ngram_containment_pairs(
                d, "doc_id", "text", n=4, threshold=0.9,
                max_shingle_df=64,
            )
        ),
        # sketch-vs-exact quantile contract per lang: one sketch groupBy +
        # broadcast rank probe + per-group window — all group-bounded
        "quantile_contract": lambda d, e: run_count(
            fb.approx_percentile_check(
                d.select("doc_id", "lang", "n_chars"), "lang", "n_chars",
                "doc_id", [50_000, 500_000, 990_000], accuracy=1000,
            )
        ),
        # BOTH near-dup scores from one candidate pass: wall should track
        # the single-score containment_pairs row, not 2x it — the point
        # of the shared-machinery entry point
        "pair_scores": lambda d, e: run_count(
            fb.ngram_pair_scores(
                d, "doc_id", "text", n=4, jaccard_threshold=0.5,
                containment_threshold=0.9, max_shingle_df=64,
            )
        ),
    }
    only = sys.argv[1:]
    for name, op in OPS.items():
        if only and name not in only:
            continue
        op(docs1, emb1)  # warm this op's codegen/kernel paths
        t0 = time.perf_counter()
        op(docs1, emb1)
        t1 = time.perf_counter() - t0
        fb.release_caches()
        t0 = time.perf_counter()
        op(docs10, emb10)
        t10 = time.perf_counter() - t0
        fb.release_caches()
        print(
            json.dumps(
                {
                    "op": name,
                    "t1": round(t1, 2),
                    "t10": round(t10, 2),
                    "ratio": round(t10 / t1, 2) if t1 > 0 else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
