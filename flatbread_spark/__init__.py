"""flatbread_spark: a PySpark-native analytics engine with flatbread's
tabulation semantics (margins, subtotals, percentage blocks, label tracking)
plus the pivot construction and large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) the reference
assumes away.

Fluent usage mirrors the reference's ``df.pita`` accessor
(``/root/reference/flatbread/accessors/dataframe.py:14``)::

    from flatbread_spark import pivot_table
    ff = pivot_table(lineitem, index="l_returnflag", columns="l_linestatus",
                     values="l_quantity", aggfunc="sum")
    ff = ff.add_totals(axis=2).add_percentages(axis=1, ndigits=1)
    ff.to_df().show()
"""
from __future__ import annotations

from flatbread_spark.cache import pinned_tags, release as release_caches
from flatbread_spark.config import CONFIG, get_defaults
from flatbread_spark.frame import POS, ColInfo, FlatFrame
from flatbread_spark.session import get_spark
from flatbread_spark.sources import crosstab, load_table, load_tables, pivot_table

__version__ = "0.1.0"


def _attach_fluent_api() -> None:
    """Bind operator functions as FlatFrame methods (the ``pita`` analog)."""
    from flatbread_spark.operators import aggregation as _agg
    from flatbread_spark.operators import totals as _tot
    from flatbread_spark.operators import percentages as _pct
    from flatbread_spark.operators import levels as _lvl
    from flatbread_spark.operators import dates as _dates
    from flatbread_spark.operators import differences as _diff

    FlatFrame.add_agg = _agg.add_agg
    FlatFrame.add_subagg = _agg.add_subagg
    FlatFrame.add_totals = _tot.add_totals
    FlatFrame.add_subtotals = _tot.add_subtotals
    FlatFrame.drop_totals = _tot.drop_totals
    FlatFrame.as_percentages = _pct.as_percentages
    FlatFrame.add_percentages = _pct.add_percentages
    # reference accessor aliases (dataframe.py:163,224)
    FlatFrame.as_pct = _pct.as_percentages
    FlatFrame.add_pct = _pct.add_percentages
    FlatFrame.sort_aggregates = _lvl.sort_aggregates
    FlatFrame.sort_totals = _lvl.sort_totals
    FlatFrame.add_level = _lvl.add_level
    FlatFrame.sort_index_from_list = _lvl.sort_index_from_list
    FlatFrame.add_differences = _diff.add_differences

    from flatbread_spark.output import display as _disp
    from flatbread_spark.output import excel as _xl

    FlatFrame.display = lambda self: _disp.Display(self)
    FlatFrame._repr_html_ = lambda self: _disp.Display(self)._repr_html_()
    FlatFrame.data_spec = lambda self: _disp.Display(self).data_spec()
    FlatFrame.get_json = lambda self: _disp.Display(self).get_json()
    FlatFrame.export_excel = _xl.export_excel


_attach_fluent_api()

from flatbread_spark.operators.counts import value_counts  # noqa: E402

# pipeline-operator surface (beyond-reference): exported at package level so
# a corpus pipeline reads as one import
from flatbread_spark.operators.asof import (  # noqa: E402
    asof_join,
    interval_join,
    range_join_bucketed,
)
from flatbread_spark.operators.dedup import (  # noqa: E402
    chunk_self_dedup,
    dedup_exact,
    dedup_incremental,
    embedding_contamination,
    embedding_dup_pairs,
    minhash_lsh_pairs,
    minhash_probe,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    ngram_pair_scores,
    simhash_pairs,
)
from flatbread_spark.operators.bloom import (  # noqa: E402
    bloom_build,
    bloom_check,
    bloom_filter_novel,
)
from flatbread_spark.operators.chunking import chunk_windows  # noqa: E402
from flatbread_spark.operators.classifier import score_hashed_linear  # noqa: E402
from flatbread_spark.operators.graph import (  # noqa: E402
    bipartite_project,
    connected_components,
    degree_spectrum,
    triangle_count,
    dedup_clusters,
    pagerank_fixed,
)
from flatbread_spark.operators.events import (  # noqa: E402
    conversion_lag,
    event_transitions,
    rolling_counts,
    session_paths,
)
from flatbread_spark.operators.curation import (  # noqa: E402
    curation_funnel,
    gini_concentration,
    robust_outlier_gate,
    standardize,
    vector_audit,
    vocab_overlap,
)
from flatbread_spark.operators.fusion import rrf_fuse  # noqa: E402
from flatbread_spark.operators.privacy import k_anonymity  # noqa: E402
from flatbread_spark.operators.trend import (  # noqa: E402
    ks_drift,
    rolling_median,
    theil_sen,
    tvd_drift,
)
from flatbread_spark.operators.vocabulary import (  # noqa: E402
    characteristic_terms,
    doc_freq_spectrum,
)
from flatbread_spark.operators.kmeans import kmeans_lloyd  # noqa: E402
from flatbread_spark.operators.layout import cluster_by_zorder, zorder_key  # noqa: E402
from flatbread_spark.operators.lm import pmi_bigrams, trigram_typicality  # noqa: E402
from flatbread_spark.operators.pca import (  # noqa: E402
    covariance_matrix,
    embedding_mean,
    pca_project,
    pca_train,
)
from flatbread_spark.operators.packing import (  # noqa: E402
    build_packs,
    pack_sequences,
    scalable_cumsum,
    truncation_curve,
)
from flatbread_spark.operators.sampling import (  # noqa: E402
    assign_split,
    fps_select,
    sample_deterministic,
    sample_exact_n,
    sample_exact_n_per_group,
    sample_stratified,
    sample_token_budget,
    sample_weighted,
)
from flatbread_spark.operators.sketches import (  # noqa: E402
    approx_topk_tokens,
    cms_build,
    cms_estimate,
)
from flatbread_spark.operators.spans import (  # noqa: E402
    hot_ngram_coverage,
    hot_ngram_hashes,
    mask_hot_ngrams,
)
from flatbread_spark.operators.similarity import (  # noqa: E402
    ivf_candidates,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    mine_contrastive_negatives,
    mmr_rerank,
    rank_topk,
)
from flatbread_spark.operators.tokenizer import (  # noqa: E402
    apply_merges,
    bpe_train,
    char_entropy,
    mix_temperature,
    pair_counts,
    top_vocab,
    vocab_coverage,
)
from flatbread_spark.operators.versioning import (  # noqa: E402
    merge_upsert,
    scd2_intervals,
    snapshot_diff,
    snapshot_diff_summary,
)
from flatbread_spark.operators.timeseries import gap_fill  # noqa: E402
from flatbread_spark.operators.linkage import (  # noqa: E402
    canonicalize_names,
    fuzzy_match_pairs,
)
from flatbread_spark.operators.validate import validate_constraints  # noqa: E402
from flatbread_spark.operators.skew import (  # noqa: E402
    field_association,
    join_estimate,
    salt_explode_join,
    salted_agg,
    skew_profile,
)
from flatbread_spark.operators.timeseries import rate_anomaly  # noqa: E402
from flatbread_spark.operators.curation import (  # noqa: E402
    label_vote,
    rater_agreement,
)
from flatbread_spark.operators.ranking import (  # noqa: E402
    approx_percentile_check,
    curriculum_order,
    exact_percentiles,
    group_percentiles,
    group_weighted_percentiles,
    quantile_bucketize,
    weighted_percentiles,
    winsorize,
    quantile_normalize,
)
from flatbread_spark.operators.boilerplate import (  # noqa: E402
    boilerplate_prefixes,
    strip_boilerplate_prefix,
)
from flatbread_spark.operators.spans import ngram_novelty  # noqa: E402
from flatbread_spark.operators.similarity import knn_quantized  # noqa: E402
from flatbread_spark.operators.dedup import dup_source_matrix  # noqa: E402
from flatbread_spark.operators.sampling import (  # noqa: E402
    sample_domain_capped,
    sample_to_mix,
)
from flatbread_spark.functions.urls import (  # noqa: E402
    canonical_url,
    dedup_by_url,
    registered_domain,
)
from flatbread_spark.sources.tables import read_table, write_table  # noqa: E402

__all__ = [
    "FlatFrame", "ColInfo", "POS", "get_spark", "CONFIG", "get_defaults",
    "release_caches", "pinned_tags",
    "pivot_table", "crosstab", "load_table", "load_tables", "value_counts",
    "read_table", "write_table",
    "asof_join", "range_join_bucketed", "interval_join",
    "dedup_exact", "dedup_incremental", "minhash_lsh_pairs", "simhash_pairs",
    "ngram_jaccard_pairs", "embedding_dup_pairs", "chunk_self_dedup",
    "connected_components", "dedup_clusters", "pagerank_fixed",
    "sample_deterministic", "sample_stratified", "sample_token_budget",
    "sample_weighted",
    "assign_split", "pack_sequences", "build_packs", "scalable_cumsum",
    "truncation_curve",
    "curation_funnel",
    "trigram_typicality", "pmi_bigrams", "kmeans_lloyd", "zorder_key", "cluster_by_zorder",
    "approx_topk_tokens", "covariance_matrix", "embedding_mean", "pca_train", "pca_project",
    "knn_bruteforce", "knn_lsh", "knn_ivf", "ivf_candidates", "rank_topk",
    "mine_contrastive_negatives", "mmr_rerank",
    "pair_counts", "char_entropy", "mix_temperature",
    "bpe_train", "apply_merges",
    "chunk_windows", "score_hashed_linear",
    "bloom_build", "bloom_check", "bloom_filter_novel",
    "top_vocab", "vocab_coverage",
    "hot_ngram_hashes", "hot_ngram_coverage", "mask_hot_ngrams",
    "robust_outlier_gate",
    "merge_upsert", "snapshot_diff", "snapshot_diff_summary",
    "scd2_intervals", "tvd_drift",
    "gap_fill", "fuzzy_match_pairs", "canonicalize_names",
    "validate_constraints",
    "skew_profile", "salted_agg", "salt_explode_join", "join_estimate",
    "field_association",
    "sample_domain_capped", "sample_to_mix", "rate_anomaly", "label_vote",
    "rater_agreement", "embedding_contamination",
    "curriculum_order", "dup_source_matrix", "minhash_probe",
    "quantile_bucketize", "exact_percentiles", "boilerplate_prefixes",
    "strip_boilerplate_prefix", "ngram_novelty", "knn_quantized",
    "quantile_normalize", "winsorize", "group_percentiles", "standardize", "event_transitions",
    "cms_build", "cms_estimate", "ngram_containment_pairs", "ngram_pair_scores", "approx_percentile_check",
    "session_paths", "conversion_lag", "rolling_counts", "vocab_overlap",
    "gini_concentration", "characteristic_terms", "doc_freq_spectrum",
    "fps_select", "theil_sen", "weighted_percentiles", "rrf_fuse",
    "ks_drift", "sample_exact_n", "group_weighted_percentiles",
    "vector_audit", "k_anonymity", "triangle_count",
    "sample_exact_n_per_group", "degree_spectrum", "rolling_median",
    "bipartite_project",
    "canonical_url", "registered_domain", "dedup_by_url",
]
