"""Empty-input robustness (r7): a production ingest loop routinely sees
empty micro-batches and empty partitions — pipeline operators must flow
them through as empty results, and model/target operators must fail
with a CLEAR ValueError, never a TypeError from an unguarded .first().

A full sweep of all 167 driver entries against zero-row mirrors of the
tables was run once interactively (158 ok out of the box; the 9 fixes
this file pins); here a representative subset keeps the property in CI
without the full-sweep cost.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as m

EMPTY_DIR = "/tmp/spark_graft_sf_empty_ci"


@pytest.fixture(scope="module")
def empty_dir(spark):
    src = "/root/testdata/sf0.001"
    os.makedirs(EMPTY_DIR, exist_ok=True)
    for t in m.TABLES:
        p = os.path.join(EMPTY_DIR, f"{t}.parquet")
        if not os.path.isdir(p):
            spark.read.parquet(os.path.join(src, f"{t}.parquet")).limit(
                0
            ).write.mode("overwrite").parquet(p)
    return EMPTY_DIR


# pipeline ops: empty in -> empty out (one per family, incl. every
# entry the r7 sweep found crashing)
FLOW_THROUGH = [
    "shards_roundtrip",
    "hybrid_search_docs",
    "similarity_lsh_topk",
    "embedding_near_dups",
    "similarity_topk_arrow",
    "minhash_against_corpus",
    "dsir_weights_docs",
    "novelty_scores_docs",
    "bpe_merges_docs",
    "dedup_against_corpus",
    "ingest_pipeline_docs",
    "tfidf_docs",
    "q1_pricing_summary",
    "rolling_hour_events",
    "simhash_against_corpus",
    "similarity_topk_filtered",
    "gopher_gates_docs",
    "c4_clean_docs",
    "ccnet_buckets_docs",
    "simhash_index_roundtrip",
    # r8 session additions
    "web_curation_docs",
    "leakage_safe_splits_docs",
    "cms_heavy_grams_docs",
    "random_projection_emb",
    # r8 third-session additions
    "hll_distinct_tokens",
    "winnow_near_dups_docs",
    "soft_dedup_weights_docs",
    "exact_quantiles_lineitem",
    "quantile_trim_docs",
    "tokenizer_fertility_docs",
    "weighted_sample_docs",
    "bpe_oov_rate_docs",
    "blocklist_annotate_docs",
    "grouped_quantiles_docs",
    # r9 additions: intra-doc dedup flows empty docs through; the PSI
    # monitor scores zero windows against an empty-but-grid-carrying
    # reference histogram (grid rides in column METADATA, present even
    # at zero rows). url_*/quality_fit entries use planted frames and
    # have no table dependence.
    "intra_doc_dedup_docs",
    "windowed_psi_events",
    # r9 governance/anomaly additions: empty corpus -> zero classes /
    # zero flagged rows
    "k_anonymity_customer",
    "k_anonymize_customer",
    "k_generalize_customer",
    "mad_anomalies_events",
    "l_diversity_customer",
    "cohort_retention_events",
    "cooccurrence_lineitem",
    "funnel_latency_events",
    "mode_lineitem",
    "kaplan_meier_events",
]

# model/target ops: a clear ValueError, never an unguarded TypeError
CLEAR_ERROR = [
    "outlier_kernel",
    "outlier_explain",
    "outlier_explain_std",
    "outlier_explain_text",
    "similarity_ivf_topk",
    "cluster_sample_emb",
    # PQ needs a non-empty corpus to donate codebook sub-vectors
    "similarity_pq_topk",
    # PCA moments need >= 1 non-null vector (gram_moments raises)
    "pca_component_emb",
    "pca_scores_emb",
    "pca_residuals_emb",
    "pca_component2_emb",
    "ab_test_events",
]


@pytest.mark.parametrize("entry", FLOW_THROUGH)
def test_pipeline_entries_flow_empty_through(spark, empty_dir, entry):
    assert m.queries()[entry](spark, empty_dir).count() == 0


@pytest.mark.parametrize("entry", CLEAR_ERROR)
def test_model_entries_raise_clear_error_on_empty(spark, empty_dir, entry):
    with pytest.raises(ValueError):
        m.queries()[entry](spark, empty_dir).count()


def test_hll_estimate_of_empty_corpus_is_zero(spark, empty_dir):
    """A global HLL over an empty corpus is not an error: all registers
    stay empty, linear counting reports exactly 0 distinct."""
    r = m.queries()["hll_fingerprints_docs"](spark, empty_dir).collect()
    assert len(r) == 1 and r[0]["est_distinct"] == 0.0 and r[0]["method"] == "linear"


def test_one_row_reports_on_empty_corpus(spark, empty_dir):
    """The global report entries return their one summary row with zero
    counts on an empty corpus (an empty report would read as 'no data
    checked', not 'nothing found')."""
    ov = m.queries()["corpus_overlap_docs"](spark, empty_dir).collect()
    assert len(ov) == 1 and ov[0]["distinct_docs_a"] == 0
    est = m.queries()["corpus_minhash_overlap"](spark, empty_dir).collect()
    assert len(est) == 1 and est[0]["matches"] == 0
    psi = m.queries()["histogram_psi_events"](spark, empty_dir).collect()
    assert len(psi) == 1 and psi[0]["psi"] == 0.0 and psi[0]["n_a"] == 0
    prof = m.queries()["table_profile_lineitem"](spark, empty_dir).collect()
    assert len(prof) == 3 and all(r["n_rows"] == 0 for r in prof)
    cons = m.queries()["check_constraints_lineitem"](spark, empty_dir).collect()
    assert len(cons) == 3 and all(r["passed"] for r in cons)
    # the funnel keeps its one-row-per-step shape with zero counts and a
    # NULL conversion (no step-0 users to divide by)
    fun = m.queries()["event_funnel_events"](spark, empty_dir).collect()
    assert len(fun) == 3 and all(
        r["n_users"] == 0 and r["conversion_micro"] is None for r in fun
    )
    # the dependence report keeps its one-row shape with all-zero stats
    dep = m.queries()["dependence_orders"](spark, empty_dir).collect()
    assert len(dep) == 1 and dep[0]["n"] == 0 and dep[0]["chi2_nano"] == 0
    assert dep[0]["mi_nano"] == 0 and dep[0]["cramers_v_micro"] == 0


def test_empty_result_schema_inherits_id_type(spark):
    """Empty early returns must carry the SAME schema as the non-empty
    path for any id type (ADVICE r7 low: hardcoded 'long' DDL broke
    unionByName for int/string ids that work on non-empty inputs)."""
    from pd_explain_spark.functions.similarity import (
        brute_force_topk_arrow,
        embedding_near_duplicates,
        lsh_topk,
    )

    empty_int = spark.createDataFrame([], "vec_id int, embedding array<double>")
    out = lsh_topk(empty_int, empty_int, k=3)
    assert out.schema["query_id"].dataType.simpleString() == "int"
    assert out.schema["neighbor_id"].dataType.simpleString() == "int"
    assert out.count() == 0

    empty_str = spark.createDataFrame([], "vec_id string, embedding array<double>")
    pairs = embedding_near_duplicates(empty_str)
    assert pairs.schema["id_a"].dataType.simpleString() == "string"
    assert pairs.count() == 0

    # arrow flavor: int ids round-trip as int on BOTH paths...
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])], "vec_id int, embedding array<double>"
    )
    nonempty = brute_force_topk_arrow(corpus, corpus, k=1)
    empty_q = brute_force_topk_arrow(
        corpus, spark.createDataFrame([], "vec_id int, embedding array<double>"), k=1
    )
    # names + types must agree (nullability differences union-reconcile)
    assert [(f.name, f.dataType) for f in nonempty.schema] == [
        (f.name, f.dataType) for f in empty_q.schema
    ]
    assert nonempty.schema["neighbor_id"].dataType.simpleString() == "int"
    assert nonempty.count() == 2
    # ...and non-integral ids fail the contract loudly, not deep in numpy
    with pytest.raises(TypeError, match="integral"):
        brute_force_topk_arrow(empty_str, empty_str, k=1)
