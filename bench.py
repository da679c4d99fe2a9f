"""Headline-query benchmark. Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
cores from $SPARK_GRAFT_CPUS. Each query is executed to completion
(count or full collect of a small result) — wall-clock includes the
Spark job, not plan construction only.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pd_explain_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline subset: relational ops, explainers, pipeline extensions
HEADLINE = [
    "filter_quantity",
    "groupby_multi_key",
    "groupby_nunique",
    "join_inner",
    "join_left_agg",
    "join_dims_broadcast",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "fedex_filter_explain",
    "fedex_groupby_explain",
    "outlier_explain",
    "dedup_exact",
    "curate_documents",
    "minhash_near_dups",
    "similarity_topk",
    "text_profile",
    "windowed_events",
    "sessionize_events",
    "many_to_one_explain",
    "metainsight_explain",
    # round-2 additions: time-series + reshape surface
    "asof_join_events",
    "rolling_hour_events",
    "cumsum_events",
    "groupby_transform_mean",
    "melt_lineitem",
    # round-4 additions: repetition quality gates, duplicate clustering,
    # drift monitoring, embedding centroids, pandas query strings
    "repetition_signals",
    "near_dup_components",
    "drift_scores_events",
    "embedding_centroid_dist",
    "query_string_filter",
    "curation_pipeline",
    # round-5 additions: oracle-checked explainer kernels
    "fedex_filter_kernel",
    "outlier_kernel",
    "shapley_kernel",
    "many_to_one_kernel",
    "metainsight_kernel",
    # round-5 additions: training-mix constructors
    "redact_pii",
    "stratified_sample_lang",
    "pack_sequences",
    "assign_splits",
    # round-5 additions: TPC-H plan shapes + interval/cumulative ops
    "q4_priority_count",
    "q13_customer_distribution",
    "q7_nation_trade_flow",
    "q2_min_price_part",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_idle_balances",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "range_join_events",
    "expanding_stats_events",
    "ewm_events",
    "interval_join_events",
    "ffill_events",
    # round-5 additions: segment dedup, chunking, contamination, term stats
    "segment_dedup_docs",
    "chunk_documents_overlap",
    "contamination_pairs_docs",
    "decontaminate_docs",
    "tfidf_docs",
    "bm25_docs",
    "vocabulary_docs",
    "temperature_sample_docs",
    "dedup_against_corpus",
    "near_dup_against_corpus",
    "ingest_pipeline_docs",
    "top_terms_docs",
    "hybrid_search_docs",
    # round-5 continuation: hash-checked IVF + multimodal kernels,
    # survivor-policy dedup
    "similarity_ivf_fixed",
    "multimodal_features_kernel",
    "near_dup_keep_longest",
    "shuffle_shards_docs",
    "corpus_stats_by_lang",
    # round-5 continuation: remaining TPC-H shapes
    "q8_market_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_late_blame",
    "q16_supplier_count",
    "q9_profit_rollup",
    "q11_important_stock",
    "q20_dominant_suppliers",
]


def main() -> int:
    spark = get_spark("bench")
    qs = entrymod.queries()
    # Warm the JVM (codegen, parquet footer reads, shuffle service) with one
    # untimed pass of the first query: round-1 showed filter_quantity at
    # 9.5 s cold vs ~2 s warm — the 7 s delta is session start, not the query.
    try:
        qs[HEADLINE[0]](spark, SF_DIR).count()
    except Exception:
        pass
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
        # queries are independent: drop one query's scratch persists so
        # they don't eat executor memory from the queries after it.
        # clearCache only covers SQL cache; localCheckpoint blocks (the
        # connected-components queries) are freed by the ContextCleaner
        # once Python drops its references — gc.collect() makes that
        # happen now instead of mid-way through the next timed query.
        spark.catalog.clearCache()
        import gc

        gc.collect()
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
