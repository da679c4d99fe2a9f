"""10x empirical scale smoke (VERDICT r5 task #5).

All other scale arguments in this repo are plan-level (scale_audit,
explain-pinned shuffles); this test adds one EMPIRICAL point: a ~10x
dataset built by unioning 10 key-shifted copies of the sf0.1 tables,
with document text DUPLICATED VERBATIM on purpose — exact duplication is
the adversarial case for the near-dup pipeline (every LSH band bucket
gets 10 co-located copies), so an accidentally quadratic path shows up
as a >>10x wall-time blowup that the plan auditor cannot see.

Each expensive entry must finish in under 10x its measured sf0.1 time
(with a 1 s floor so sub-second baselines don't produce flaky ratios).
Opt-in: set SPARK_GRAFT_SCALE_SMOKE=1 (the build + runs take minutes);
the per-entry ratios are recorded in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import pytest

sys.path.insert(0, "/root/repo")

if os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1":
    pytest.skip(
        "scale smoke is opt-in: SPARK_GRAFT_SCALE_SMOKE=1", allow_module_level=True
    )

import __spark_entry__ as m

SF_DIR = "/root/testdata/sf0.1"
SCALE_DIR = "/tmp/spark_graft_scale10x"
COPIES = 10
SHIFT = 10_000_000

# the 8 most expensive plans per the r5 judge's scale_audit, with
# multimodal_features_kernel (fixed-n synthetic input, nothing to scale)
# replaced by tfidf_docs
ENTRIES = [
    "minhash_near_dups",
    "curation_pipeline",
    "near_dup_keep_longest",
    "segment_dedup_docs",
    "ingest_pipeline_docs",
    "tfidf_docs",
    "metainsight_kernel",
    "q21_late_blame",
]

# key column to shift per fact table (dims are copied once, unscaled —
# at a real 10x, dimensions grow far slower than facts)
FACT_SHIFT = {
    "documents": "doc_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
}
DIMS = ["region", "nation", "supplier", "customer", "part"]


@pytest.fixture(scope="module")
def scale_dir(spark):
    from pyspark.sql import functions as F

    if not os.path.isdir(SCALE_DIR):
        os.makedirs(SCALE_DIR, exist_ok=True)
        try:
            for name, key in FACT_SHIFT.items():
                src = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
                parts = [
                    src.withColumn(key, F.col(key) + F.lit(i * SHIFT))
                    for i in range(COPIES)
                ]
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionByName(p)
                out.write.mode("overwrite").parquet(
                    os.path.join(SCALE_DIR, f"{name}.parquet")
                )
            for name in DIMS:
                spark.read.parquet(
                    os.path.join(SF_DIR, f"{name}.parquet")
                ).write.mode("overwrite").parquet(
                    os.path.join(SCALE_DIR, f"{name}.parquet")
                )
        except BaseException:
            shutil.rmtree(SCALE_DIR, ignore_errors=True)
            raise
    return SCALE_DIR


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_scales_linearish(spark, scale_dir, name):
    fn = m.queries()[name]
    t0 = time.time()
    fn(spark, SF_DIR).count()
    base = time.time() - t0
    spark.catalog.clearCache()
    t0 = time.time()
    n = fn(spark, scale_dir).count()
    scaled = time.time() - t0
    spark.catalog.clearCache()
    allowed = 10.0 * max(base, 1.0)
    print(
        f"\nSCALE {name}: sf0.1 {base:.2f}s -> 10x {scaled:.2f}s "
        f"(ratio {scaled / max(base, 1e-9):.1f}x, {n} rows)"
    )
    assert scaled < allowed, (
        f"{name}: 10x data took {scaled:.1f}s vs {base:.1f}s at 1x "
        f"(> {allowed:.1f}s budget) — super-linear scaling"
    )
