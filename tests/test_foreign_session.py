"""Driver-environment simulation: a BARE SparkSession, none of our configs.

Rounds 1 and 3 both lost correctness rows to exactly this gap — code that
worked under get_spark() (nanosAsLong, UTC, AQE, Arrow configs) crashed
under the correctness driver's own plain session. This test runs a
representative slice of the driver contract in a SUBPROCESS with a
minimal `SparkSession.builder.master("local[4]")` session: timestamp
reads (the r1/r3 failure), an ordered operator, a windowed aggregate, the
Arrow mapInPandas path, and the flagship entry().

Slow (fresh JVM) — but it is the only test that fails when a query
silently depends on a get_spark()-only config.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("foreign_driver_sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as m

sf = "/root/testdata/sf0.001"
for name in [
    "rolling_hour_events",   # TIMESTAMP_NTZ + range window (r3 red row)
    "cumsum_events",         # bucketed prefix scan (r3 red row)
    "asof_join_events",      # epoch_micros path
    "windowed_events",       # F.window over NTZ
    "multimodal_features_kernel",  # Arrow mapInPandas without explicit arrow conf
    "drift_scores_events",   # round-4 op
    "fedex_filter_kernel",   # round-5 oracle kernels: window fns + createDataFrame
    "outlier_kernel",
    "metainsight_kernel",    # groupingSets + grouping_id under bare session
    "segment_dedup_docs",    # round-5 wave 3: higher-order fns + broadcast join
    "tfidf_docs",            # scalar cross-join idiom under bare session
    "ingest_pipeline_docs",  # composed anti-joins + persist/localCheckpoint
]:
    n = m.queries()[name](spark, sf).count()
    assert n > 0, name
    print(f"ok {name} {n}", flush=True)
n = m.entry(spark).count()
assert n >= 0
print("ok entry", n, flush=True)
"""


def test_driver_contract_under_bare_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert proc.stdout.count("ok ") == 13, proc.stdout
