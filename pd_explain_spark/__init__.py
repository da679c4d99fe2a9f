"""pd_explain_spark — a PySpark-native explainable-analytics engine.

Re-expression of the capabilities of analysis-bots/pd-explain
(explainable dataframes: lineage capture over filter / group-by+agg /
join, plus FEDEX / outlier / many-to-one / MetaInsight / Shapley
explanation operators) on top of the Spark DataFrame API, extended with
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, streaming windows).
"""

from .core.frame import ExplainableDataFrame, concat
from .core.operations import (
    BJoinOp,
    BoolExpr,
    Comparison,
    FilterOp,
    GroupByOp,
    JoinOp,
    NotExpr,
    Operation,
)
from .core.series import ExplainableColumn, ExplainablePredicate
from .operators.asof import merge_asof
from .operators.rangejoin import range_join
from .plans.audit import assert_scalable, scale_audit
from .operators.partitioning import count_distinct_skew_safe, salted_join
from .config import GLOBALS, get_use_sampling_value, toggle_sampling
from .llm.client import LlmSetupMethods
from .functions.dedup import (NearDupIndex, SimHashIndex, dedup_against, dedup_near,
                              dedup_near_against, duplicate_components,
                              edit_distance_pairs, edit_distance_pairs_against,
                              fuzzy_dedup, fuzzy_dedup_against, keep_best,
                              minhash_dedup_against, minhash_pairs_against,
                              near_dup_pairs_against, simhash_dedup_against,
                              simhash_pairs_against, winnow_dedup,
                              winnow_fingerprint_index, winnow_pairs)
from .functions.drift import drift_scores, reference_histogram, stream_drift_scores
from .functions.mixing import (assign_splits, dsir_log_ratios, dsir_sample,
                               dsir_weights, leakage_safe_splits,
                               pack_sequences, redact_pii,
                               shuffle_assign, stratified_sample,
                               temperature_sample, token_budget_sample,
                               write_shards)
from .functions.classifier import (QualityModel, score_quality,
                                   train_quality_classifier)
from .functions.contamination import (contamination_pairs, decontaminate,
                                      novelty_scores)
from .functions.sketches import (bloom_build, bloom_dedup_against,
                                 bloom_merge, cms_build, cms_heavy_grams,
                                 cms_merge, hll_distinct, hll_estimate,
                                 hll_merge, hll_sketch)
from .functions.relevance import (bm25_scores, build_vocabulary, hybrid_search,
                                  tf_idf, top_terms_per_doc)
from .functions.segments import (chunk_documents, segment_dedup,
                                 segment_frequencies, span_dedup)
from .functions.similarity import (IvfIndex, brute_force_topk_arrow,
                                   ivf_build_kmeans,
                                   ivf_build, ivf_build_fixed,
                                   ivf_query, semantic_dedup,
                                   semantic_dedup_against,
                                   semantic_dedup_pairs,
                                   semantic_dedup_pairs_against,
                                   prototype_prune, prototype_scores,
                                   ivf_pq_topk,
                                   pq_build_fixed, pq_encode, pq_topk,
                                   random_projection)
from .functions.bpe import bpe_encode, train_bpe
from .functions.clustering import (cluster_balanced_sample, kmeans_assign,
                                   kmeans_cluster_stats, kmeans_fit)
from .functions.text import (bigram_lm_scores, c4_clean, ccnet_buckets, ccnet_cuts, char_entropy_scores, corpus_diff, corpus_stats, gopher_gates,
                             curation_pipeline, hashed_embeddings,
                             ingest_pipeline, repetition_signals,
                             source_gate_table, source_gates,
                             stream_corpus_stats,
                             unigram_lm_scores)
from .session import get_spark
from .sources.readers import (load_table, read_csv, read_json, read_orc,
                              read_parquet, to_explainable)

__version__ = "0.1.0"

__all__ = [
    "ExplainableDataFrame",
    "concat",
    "merge_asof",
    "range_join",
    "ExplainableColumn",
    "ExplainablePredicate",
    "Operation",
    "FilterOp",
    "GroupByOp",
    "JoinOp",
    "BJoinOp",
    "Comparison",
    "BoolExpr",
    "NotExpr",
    "get_spark",
    "toggle_sampling",
    "get_use_sampling_value",
    "LlmSetupMethods",
    "GLOBALS",
    "read_csv",
    "read_parquet",
    "read_json",
    "read_orc",
    "to_explainable",
    "load_table",
    # round-4 pipeline surface
    "dedup_near",
    "dedup_against",
    "near_dup_pairs_against",
    "dedup_near_against",
    "duplicate_components",
    "keep_best",
    "drift_scores",
    "reference_histogram",
    "stream_drift_scores",
    "curation_pipeline",
    "c4_clean",
    "gopher_gates",
    "source_gates",
    "source_gate_table",
    "char_entropy_scores",
    "corpus_diff",
    "ccnet_buckets",
    "ccnet_cuts",
    "ingest_pipeline",
    "repetition_signals",
    "ivf_build",
    "ivf_build_fixed",
    "ivf_build_kmeans",
    "ivf_query",
    "IvfIndex",
    "cluster_balanced_sample",
    "kmeans_assign",
    "kmeans_cluster_stats",
    "kmeans_fit",
    "salted_join",
    "count_distinct_skew_safe",
    # round-5 training-mix surface
    "redact_pii",
    "stratified_sample",
    "temperature_sample",
    "token_budget_sample",
    "prototype_scores",
    "prototype_prune",
    "pack_sequences",
    "assign_splits",
    "leakage_safe_splits",
    "shuffle_assign",
    "write_shards",
    "corpus_stats",
    "stream_corpus_stats",
    "scale_audit",
    "assert_scalable",
    # round-5 segment surface
    "segment_dedup",
    "span_dedup",
    "segment_frequencies",
    "chunk_documents",
    "contamination_pairs",
    "decontaminate",
    "tf_idf",
    # round-6 surface: SemDeDup, fuzzy dedup, unigram LM scoring
    "semantic_dedup",
    "semantic_dedup_pairs",
    "semantic_dedup_against",
    "semantic_dedup_pairs_against",
    "edit_distance_pairs",
    "fuzzy_dedup",
    "edit_distance_pairs_against",
    "minhash_pairs_against",
    "minhash_dedup_against",
    "simhash_pairs_against",
    "simhash_dedup_against",
    "winnow_fingerprint_index",
    "winnow_pairs",
    "winnow_dedup",
    "dsir_log_ratios",
    "dsir_weights",
    "dsir_sample",
    "novelty_scores",
    "cms_build",
    "cms_heavy_grams",
    "cms_merge",
    "bloom_build",
    "bloom_merge",
    "bloom_dedup_against",
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "hll_distinct",
    "brute_force_topk_arrow",
    "pq_build_fixed",
    "pq_encode",
    "pq_topk",
    "ivf_pq_topk",
    "random_projection",
    "train_quality_classifier",
    "score_quality",
    "QualityModel",
    "hashed_embeddings",
    "fuzzy_dedup_against",
    "unigram_lm_scores",
    "bigram_lm_scores",
    "train_bpe",
    "bpe_encode",
    "NearDupIndex",
    "SimHashIndex",
    "bm25_scores",
    "build_vocabulary",
    "top_terms_per_doc",
    "hybrid_search",
]
