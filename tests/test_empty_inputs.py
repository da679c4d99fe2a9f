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
]

# model/target ops: a clear ValueError, never an unguarded TypeError
CLEAR_ERROR = [
    "outlier_kernel",
    "outlier_explain",
    "outlier_explain_std",
    "outlier_explain_text",
    "similarity_ivf_topk",
]


@pytest.mark.parametrize("entry", FLOW_THROUGH)
def test_pipeline_entries_flow_empty_through(spark, empty_dir, entry):
    assert m.queries()[entry](spark, empty_dir).count() == 0


@pytest.mark.parametrize("entry", CLEAR_ERROR)
def test_model_entries_raise_clear_error_on_empty(spark, empty_dir, entry):
    with pytest.raises(ValueError):
        m.queries()[entry](spark, empty_dir).count()
