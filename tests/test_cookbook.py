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


def test_monitoring_retrieval_cookbook(spark, documents, embeddings):
    """Integration guard for the README "ingestion monitoring + hybrid
    retrieval" cookbook: the documented composition must keep running
    end-to-end and its invariants must hold (drift of a slice against
    itself is 0; the retrieval stack narrows monotonically)."""
    from pyspark.sql import functions as F

    from flatbread_spark import (
        fps_select,
        ks_drift,
        mmr_rerank,
        rrf_fuse,
        sample_exact_n,
        theil_sen,
        tvd_drift,
        weighted_percentiles,
    )
    from flatbread_spark.functions.text import bm25_topk, token_count
    from flatbread_spark.operators.similarity import knn_bruteforce

    # --- monitoring family over synthetic daily counts + corpus slices
    daily = documents.groupBy(
        "source", (F.col("doc_id") % 30).cast("bigint").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    slopes = theil_sen(daily, "source", "day", "n")
    assert slopes.count() > 0

    old = documents.filter("doc_id % 2 = 0")
    assert ks_drift(old, old, "n_chars").collect()[0]["d_ppm"] == 0
    assert tvd_drift(old, old, "lang").collect()[0]["tvd_ppm"] == 0

    staged = documents.select(
        "doc_id", "n_chars", token_count(F.col("text")).cast("bigint")
        .alias("n_tokens"),
    )
    wp = weighted_percentiles(
        staged, "n_chars", "n_tokens", "doc_id", [500_000, 990_000]
    ).collect()
    assert len(wp) == 2

    # --- retrieval stack: keyword + semantic -> fused -> diversified
    kw = bm25_topk(documents, "doc_id", "text", ["spark", "merge"], k=10)
    sem = knn_bruteforce(
        embeddings, embeddings.filter("vec_id = 0"), k=10
    ).selectExpr("neighbor_id AS doc_id", "rank")
    fused = rrf_fuse([kw.select("doc_id", "rank"), sem], "doc_id", top_n=10)
    assert fused.count() == 10

    diverse = mmr_rerank(
        embeddings, embeddings.filter("vec_id < 2"),
        k_candidates=10, n_select=3,
    )
    assert diverse.count() == 6  # 2 queries x 3 picks

    coreset = fps_select(embeddings, "vec_id", "embedding", k=4)
    assert coreset.count() == 4
    fixed = sample_exact_n(documents, "doc_id", 25)
    assert fixed.count() == 25


def test_dedup_playbook_cookbook(spark, documents):
    """Integration guard for the README "dedup playbook" cookbook: the
    four pair producers and the cluster/survivor step compose, and the
    family's ordering invariants hold on real corpus data — containment
    dominates Jaccard pairwise, banded MinHash never invents a pair the
    full Jaccard scan wouldn't, survivors are the cluster minima, and CMS
    never undercounts the exact token frequencies."""
    from flatbread_spark import (
        cms_build,
        cms_estimate,
        dedup_clusters,
        dedup_exact,
        minhash_lsh_pairs,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        ngram_pair_scores,
    )

    docs = documents.select("doc_id", "lang", "text")

    exact = dedup_exact(docs, "doc_id", "text")
    assert exact.agg(F.sum("n_dups")).first()[0] == docs.count()

    near = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, block_col="lang"
    )
    incl = ngram_containment_pairs(
        docs, "doc_id", "text", threshold=0.5, block_col="lang"
    )
    banded = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)

    jp = {(r["id_a"], r["id_b"]): r["jaccard"] for r in near.collect()}
    cp = {(r["id_a"], r["id_b"]): r["containment"] for r in incl.collect()}
    # the single-pass dual-score op must agree with both single-score ops
    both = {
        (r["id_a"], r["id_b"]): (r["jaccard"], r["containment"])
        for r in ngram_pair_scores(
            docs, "doc_id", "text", jaccard_threshold=0.5,
            containment_threshold=0.5, block_col="lang",
        ).collect()
    }
    assert set(both) == set(cp)  # containment >= jaccard -> union = cp keys
    assert all(both[k][0] == jp[k] for k in jp)
    assert all(both[k][1] == cp[k] for k in cp)
    # containment = |∩|/min ≥ |∩|/|∪| = jaccard, so at EQUAL thresholds the
    # jaccard pair set embeds in the containment pair set, value-wise too
    assert set(jp) <= set(cp)
    assert all(cp[k] >= jp[k] - 1e-9 for k in jp)
    # banding is candidate-capped recall over the SAME verified score:
    # never a pair the full scan lacks, never a different value. MinHash
    # has no block argument, so compare against the UNBLOCKED full scan
    # (the lang-blocked run above drops legitimate cross-lang pairs).
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    bp = {(r["id_a"], r["id_b"]): r["jaccard"] for r in banded.collect()}
    assert set(bp) <= set(full)
    assert all(abs(bp[k] - full[k]) < 1e-9 for k in bp)

    pairs = (
        near.select("id_a", "id_b")
        .unionByName(incl.filter("containment >= 0.9").select("id_a", "id_b"))
        .dropDuplicates()
    )
    labeled = dedup_clusters(docs, pairs)
    rows = labeled.collect()
    assert len(rows) == docs.count()
    roots = {r["cluster_id"] for r in rows}
    assert sum(1 for r in rows if r["is_survivor"]) == len(roots)
    assert all(r["cluster_id"] <= r["doc_id"] for r in rows)

    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).filter("token <> ''")
    truth = (
        toks.groupBy("token").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token").limit(5)
    )
    est = cms_estimate(
        cms_build(toks, "token"), truth.select("token"), "token"
    )
    for r in truth.join(est, "token").collect():
        assert r["cms_est"] >= r["n"]
