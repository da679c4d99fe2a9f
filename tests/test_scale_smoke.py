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
    # round-6 additions: verbatim duplication inflates the shared-shingle
    # candidate list ~45x for the fuzzy pairs (same as keep_longest), the
    # LM join fans linearly, and the bucketed index rebuild is one extra
    # corpus pass
    "edit_distance_pairs_docs",
    "lm_score_docs",
    "near_dup_index_bucketed",
    # round-7 additions: cross-corpus LSH (verbatim duplication inflates
    # cross-side band collisions), DSIR (two corpus scans + O(buckets)
    # model), and whole-corpus BPE encoding (train + join + explode)
    "minhash_against_corpus",
    "dsir_weights_docs",
    "bpe_encode_docs",
    # round-8 additions: token-budget prefix (per-bucket sums + one
    # boundary window) and prototype pruning (assignment pass + per-
    # cluster rank) are both ~linear in corpus size at fixed knobs
    "token_budget_mix",
    "prototype_prune_emb",
    # fitted k-means: n_iter+1 corpus scans against a broadcast k-row
    # centroid table + one (cid, coord) partial-sum aggregate — linear
    # in corpus size at fixed (k, n_iter)
    "kmeans_clusters_emb",
    "similarity_ivf_kmeans",
    # cross-corpus SimHash: 10x verbatim copies multiply cross-side
    # block collisions ~10x (every copy Hamming-0 to its original's
    # neighborhood); signatures themselves are one linear pass per side
    "simhash_against_corpus",
    # r8-session additions: the curation composition (gates are scan-
    # stage, dedup is one fingerprint shuffle, CCNet one LM shuffle);
    # CMS heavy hitters (sketch shuffle is FIXED width*depth, probe is
    # broadcast joins, re-verify bounded by survivors); leakage-safe
    # splits (verbatim 10x copies inflate the near-dup pair list like
    # keep_longest, components run on pairs only); PQ ADC (encode and
    # scan are linear passes against a broadcast 64-row codebook)
    "web_curation_docs",
    "cms_heavy_grams_docs",
    "leakage_safe_splits_docs",
    "similarity_pq_topk",
    # Bloom-filtered ingest dedup (bounded filter probe + maybe-only
    # re-verify) and IVF-PQ (bucket-pruned ADC over the code table)
    "bloom_dedup_against_corpus",
    "similarity_ivf_pq",
    # r8 third-session additions: HLL registers are a bounded keyed agg
    # (one explode + <= m rows per lang); winnowed pairs ride the
    # fingerprint self-join, which verbatim 10x copies inflate into
    # real cross-copy pairs (output grows with them, so the output-
    # growth budget applies); soft-dedup weights ride the exact trigram
    # pair list (same class as leakage_safe_splits — override below);
    # quantile entries are bounded-histogram scans + a bounded collect;
    # fertility is BPE train (distinct-word table) + one encode join
    "hll_distinct_tokens",
    "winnow_near_dups_docs",
    "soft_dedup_weights_docs",
    "exact_quantiles_lineitem",
    "quantile_trim_docs",
    "tokenizer_fertility_docs",
    # later third-session entries: weighted sampling is one scan + a
    # k-heap; PSI reads two bounded histograms; OOV is one tokenize
    # pass + a broadcastable segmentation join; the blocklist gate is a
    # scan-stage expression; the exact overlap report joins the two
    # distinct-gram sets (grows with gram cardinality, ~linear here);
    # the MinHash estimate replaces that join with 2x64 signature rows
    "weighted_sample_docs",
    "histogram_psi_events",
    "bpe_oov_rate_docs",
    "blocklist_annotate_docs",
    "corpus_overlap_docs",
    "corpus_minhash_overlap",
    # profiling: both are one scan-stage aggregate (profile adds the
    # Expand for multi-count-distinct; constraints are conditional sums)
    "table_profile_lineitem",
    "check_constraints_lineitem",
    # r9 additions (VERDICT r8 task #6): cluster-balanced sampling is
    # the k-means fit + one salted per-cluster top-n (linear at fixed
    # (k, n_iter, quota)); the end-to-end mix composition rides
    # curation_pipeline's component stage (same pair-growth behavior) +
    # two scan-stage mixing steps; the upgraded one-shot fitted IVF is
    # the same shape as similarity_ivf_kmeans at a smaller index; the
    # per-window PSI monitor is one binning pass + a windows x bins
    # spine (bins fixed, windows grow with TIME, not volume)
    "cluster_sample_emb",
    "mix_pipeline_docs",
    "similarity_ivf_topk",
    "windowed_psi_events",
    # late-r9 additions: intra-doc dedup is pure scan-stage array work;
    # the recall harness rides two pair generators (verbatim copies
    # inflate BOTH pair lists by design — same class as keep_longest,
    # override below); join_profile is two key-count aggregates + a
    # count-table join; the funnel is one aggregate per stage; the
    # compact/curriculum entries are a write+read cycle and a
    # cuts-fit + one hash shuffle respectively
    "intra_doc_dedup_docs",
    "dedup_recall_winnow",
    "join_profile_orders_customer",
    "curation_funnel_docs",
    "compact_roundtrip",
    "curriculum_order_docs",
    "dedup_sweep_winnow",  # same pair class as dedup_recall_winnow
    # r9 third-wave additions: MAD anomalies are one compressed-count
    # shuffle + two weighted-median walks + a broadcast-stats flagging
    # scan (flag count grows ~linearly with data); PCA is one Arrow
    # Gram pass (O(dim^2) per-partition partials) + a fixed 12-step
    # driver iteration, then one projection scan for the scores entry.
    # k-anonymity entries run on customer (a DIM — copied unscaled) and
    # image_ahash_planted is a fixed planted frame: nothing to scale.
    "mad_anomalies_events",
    "pca_component_emb",
    "pca_scores_emb",
    # funnel: S-1 user-keyed joins over type-pruned scans; cohort: one
    # (user, day) distinct shuffle + bounded cohort join — both ~linear
    "event_funnel_events",
    "cohort_retention_events",
    "pca_residuals_emb",  # Gram pass + one scan-stage residual pass
    # basket self-join bounded by sum(basket_size^2); 10x key-shifted
    # copies add baskets, not basket width, so pairs grow ~10x
    "cooccurrence_lineitem",
    # r10 additions (VERDICT r9 task #4, the fourth-to-sixth waves):
    # Kaplan-Meier compresses to the per-duration table in one
    # map-combining count (duration cardinality is FIXED under copies);
    # the A/B report is one two-row groupBy; funnel latency is the
    # funnel's user-keyed joins + a bounded-histogram quantile walk
    # (user event density grows 10x since copies share user_ids);
    # dependence is one (a, b) pair count + bounded-cell algebra; the
    # deflated second component re-runs the Arrow Gram pass with the
    # rank-1 projection folded in — still one corpus scan. NOT here
    # because there is nothing 10x to scale: image_ahash_planted /
    # url_canonical_planted / url_dedup_planted (fixed planted frames)
    # and the k-anonymity / l-diversity family (customer is a DIM,
    # copied unscaled by design).
    "kaplan_meier_events",
    "ab_test_events",
    "funnel_latency_events",
    "dependence_orders",
    "pca_component2_emb",
    # r10 seventh-wave additions: Nelson-Aalen shares kaplan_meier's
    # fixed-cardinality duration table; the chi-squared and kappa
    # reports are bounded-table algebra after one keyed count; both
    # attribution flavors are JOIN-FREE since r11: one user-keyed
    # shuffle + per-user range-frame window aggregates, O(events) even
    # as touch density grows 10x (the join flavor was the one
    # super-linear r10 row at 2.7x); the KS pair
    # rides a bounded distinct-value spine, and the windowed KS scores
    # per-window conditional counts against a literal probe grid; Zipf
    # is one word count + a TakeOrdered top-200. audio_features_planted
    # has nothing to scale (fixed planted frame).
    "nelson_aalen_events",
    "chisq_variants_events",
    "attribution_events",
    "attribution_linear_events",
    "ks_events_value",
    "windowed_ks_events",
    "zipf_docs",
    "rater_agreement_orders",
    # r11 (VERDICT r10 task #7): the two eval-QA entries ride scaled
    # facts — the report is bounded-cell algebra after one keyed count,
    # the calibration table one map-combining groupBy on the bin id
    "classification_report_orders",
    "calibration_events",
    # r11 eighth wave: MW-U rides the same bounded distinct-value spine
    # as KS; log-rank/CUPED compress to per-duration / per-user tables;
    # Spearman is two bucketed rank passes + one moment aggregate;
    # trimmed stats are the quantile rank search + one conditional scan;
    # readability is pure scan-stage HOFs. image_dhash_planted is a
    # fixed planted frame — nothing to scale (the audio smoke above is
    # the decode-path scaling witness).
    "mannwhitney_events",
    "logrank_events",
    "cuped_events",
    "spearman_orders",
    "trimmed_lineitem",
    "readability_docs",
    # RFM compresses to the per-user table + bounded quantile fits;
    # the Poisson bootstrap is one scan-stage explode (rows x n_boot)
    # + n_boot (sum, count) partials — work linear in rows at fixed B
    "rfm_events",
    "bootstrap_mean_events",
]

# key column to shift per fact table (dims are copied once, unscaled —
# at a real 10x, dimensions grow far slower than facts)
FACT_SHIFT = {
    "documents": "doc_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "embeddings": "vec_id",
}
DIMS = ["region", "nation", "supplier", "customer", "part"]

# explicit budget overrides (x base) for entries whose WORK scales with
# an internal quantity the output cannot reveal: near_dup_keep_longest
# returns the (constant-size) survivor set, but verbatim 10x duplication
# pushes ~45-100x the duplicate PAIRS through components + keep_best —
# growth that is by design (every cross-copy pair is a real duplicate
# edge). Measured 7.7x-20.5x across runs; 50x still fails loudly on a
# genuinely quadratic regression (~500x+ wall).
ENTRY_BUDGET = {
    "near_dup_keep_longest": 50.0,
    # same pair-explosion class: the split assignment is scan-stage, but
    # its component input rides the exact trigram pair list, which 10x
    # verbatim duplication inflates ~45-100x by design
    "leakage_safe_splits_docs": 50.0,
    # same pair-explosion class again: weights are scan-stage but the
    # component input is the exact trigram pair list (~45-100x under
    # 10x verbatim duplication, by design)
    "soft_dedup_weights_docs": 50.0,
    # both pair lists under the metric ride the 10x-verbatim pair
    # explosion (winnow candidates AND exact-trigram truth) — growth is
    # by design; the metric joins are count-table sized
    "dedup_recall_winnow": 50.0,
    "dedup_sweep_winnow": 50.0,
    # NOT output- or work-growth: pure JVM-state flake headroom. In the
    # full matrix this entry runs right after the leakage pair-explosion
    # entry and has measured 12.7x from inherited GC pressure while the
    # ISOLATED run is 0.4x (r10; both recorded). 20x still fails loudly
    # on a genuinely quadratic regression (~100x+ wall).
    "similarity_pq_topk": 20.0,
}


@pytest.fixture(scope="module")
def scale_dir(spark):
    from pyspark.sql import functions as F

    missing = [
        n for n in list(FACT_SHIFT) + DIMS
        if not os.path.isdir(os.path.join(SCALE_DIR, f"{n}.parquet"))
    ]
    if missing:
        os.makedirs(SCALE_DIR, exist_ok=True)
        try:
            for name, key in FACT_SHIFT.items():
                if name not in missing:
                    continue
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
                if name not in missing:
                    continue
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
    n_base = fn(spark, SF_DIR).count()
    base = time.time() - t0
    spark.catalog.clearCache()
    t0 = time.time()
    n = fn(spark, scale_dir).count()
    scaled = time.time() - t0
    spark.catalog.clearCache()
    # budget: wall time may grow no faster than max(data growth, OUTPUT
    # growth). Verbatim 10x duplication makes pair-emitting entries
    # produce ~100x the rows (every cross-copy pair is a true near-dup
    # that must be reported — e.g. edit_distance_pairs: 100x pairs,
    # measured 11.4x wall); holding those to 10x wall would demand
    # sub-linear work per emitted row.
    growth = max(10.0, n / max(n_base, 1), ENTRY_BUDGET.get(name, 0.0))
    allowed = growth * max(base, 1.0)
    print(
        f"\nSCALE {name}: sf0.1 {base:.2f}s ({n_base} rows) -> 10x {scaled:.2f}s "
        f"({n} rows; wall {scaled / max(base, 1e-9):.1f}x, budget {growth:.0f}x)"
    )
    assert scaled < allowed, (
        f"{name}: 10x data took {scaled:.1f}s vs {base:.1f}s at 1x "
        f"(> {allowed:.1f}s budget = max(10, output-growth)x) — super-linear scaling"
    )


def test_semantic_dedup_scales_with_centroid_knob(spark, scale_dir):
    """SemDeDup's cost is sum(bucket_size^2): with n_centroids scaled
    WITH the corpus (the documented knob — bucket sizes stay constant)
    10x data must stay within the 10x wall-time budget. Run with the
    knob FIXED instead and the work grows 100x — that is the failure
    mode this test exists to distinguish."""
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.similarity import semantic_dedup_pairs

    base_emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    t0 = time.time()
    semantic_dedup_pairs(base_emb, threshold=0.45, n_centroids=16).count()
    base = time.time() - t0
    spark.catalog.clearCache()
    big_emb = spark.read.parquet(os.path.join(scale_dir, "embeddings.parquet"))
    t0 = time.time()
    n = semantic_dedup_pairs(big_emb, threshold=0.45, n_centroids=160).count()
    scaled = time.time() - t0
    spark.catalog.clearCache()
    allowed = 10.0 * max(base, 1.0)
    print(
        f"\nSCALE semantic_dedup_pairs: sf0.1 {base:.2f}s (k=16) -> "
        f"10x {scaled:.2f}s (k=160) (ratio {scaled / max(base, 1e-9):.1f}x, {n} rows)"
    )
    assert scaled < allowed, (
        f"semantic_dedup_pairs: 10x data with 10x centroids took {scaled:.1f}s "
        f"vs {base:.1f}s (> {allowed:.1f}s) — bucket-size invariance broken"
    )


def test_aqe_skew_join_splits_hot_key(spark):
    """VERDICT r6 #7: empirical skew handling — 90% of 2M left rows on
    ONE join key. With AQE skew splitting (thresholds scaled to the
    smoke's data size, as they would be to a 100 TB job's), the hot
    key's partition must be split across tasks: no output partition may
    hold a straggler share, the executed plan must carry the 'skewed'
    AQEShuffleRead marker, and wall stays within budget. The same query
    with skew handling OFF shows the single-task funnel the guard
    exists to prevent — proving the measurement, not just the config.
    salted_join (operators/partitioning.py) is measured the same way
    with AQE skew OFF: the salt alone must spread the hot key."""
    from pyspark.sql import functions as F

    from pd_explain_spark.operators.partitioning import salted_join

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None

    n = 2_000_000
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100_000).alias("k"),
        F.concat(F.lit("payload-"), (F.col("id") * 7 % 1000).cast("string")).alias("v"),
    )
    right = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )

    def share_and_plan(joined):
        agg = joined.withColumn("pid", F.spark_partition_id()).groupBy("pid").agg(
            F.count(F.lit(1)).alias("cnt"), F.max(F.length("v")).alias("mv")
        )
        rows = agg.collect()
        tot = sum(r["cnt"] for r in rows)
        mx = max(r["cnt"] for r in rows)
        return tot, mx / tot, agg._jdf.queryExecution().executedPlan().toString()

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")

        t0 = time.time()
        tot, share, plan = share_and_plan(left.join(right, "k"))
        wall = time.time() - t0
        print(f"\nSKEW aqe-on: wall={wall:.1f}s max_task_share={share:.3f}")
        assert tot == n  # every left row matches exactly one right key
        assert share <= 0.2, f"hot key not split: one task holds {share:.0%}"
        assert "skewed" in plan
        assert wall < 60.0

        # control: skew handling OFF funnels ~90% through one task —
        # the straggler the guard prevents (also shows share_and_plan
        # actually measures task placement, not a constant)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        _, share_off, plan_off = share_and_plan(left.join(right, "k"))
        print(f"SKEW aqe-off: max_task_share={share_off:.3f}")
        assert share_off >= 0.8 and "skewed" not in plan_off

        # salted_join must spread the hot key WITHOUT AQE's help (its
        # contract: for when AQE skew splitting cannot apply)
        t0 = time.time()
        tot_s, share_s, _ = share_and_plan(salted_join(left, right, on="k"))
        wall_s = time.time() - t0
        print(f"SKEW salted: wall={wall_s:.1f}s max_task_share={share_s:.3f}")
        assert tot_s == n
        assert share_s <= 0.3, f"salt did not spread the hot key: {share_s:.0%}"
        assert wall_s < 60.0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_audio_decode_scales_linearish(spark):
    """10x smoke for the WAV decode modality (VERDICT r10 task #7): the
    windowed entry runs on a fixed planted frame, so the generic matrix
    has nothing to scale — here a generated PCM16 corpus grows 10x in
    ROW COUNT (decode work is per-row scan-stage Arrow; 91 distinct
    formula payloads cycle so generation stays cheap while every row
    still decodes)."""
    import pandas as pd

    from pd_explain_spark.functions.multimodal import audio_features, make_wav

    uniq = []
    for j in range(91):
        a, b = 17 + (j % 13), 29 + (j % 7)
        uniq.append(
            make_wav([((a * t + b) % 1999) - 999 for t in range(1000)], 8000)
        )

    def frame(n_rows: int):
        pdf = pd.DataFrame(
            {
                "media_id": list(range(n_rows)),
                "kind": ["audio"] * n_rows,
                "payload": [uniq[i % 91] for i in range(n_rows)],
            }
        )
        return spark.createDataFrame(pdf).repartition(32)

    base_df, big_df = frame(500), frame(5000)

    def run(df):
        t0 = time.time()
        n = audio_features(df).filter("sample_rate IS NOT NULL").count()
        return time.time() - t0, n

    run(base_df)  # warm (Python worker spin-up, Arrow codegen)
    base, n_base = run(base_df)
    big, n_big = run(big_df)
    print(
        f"\nSCALE audio_decode: 500 rows {base:.2f}s -> 5000 rows {big:.2f}s "
        f"(wall {big / max(base, 1e-9):.1f}x)"
    )
    assert n_base == 500 and n_big == 5000
    assert big < 10.0 * max(base, 1.0), (
        f"audio decode super-linear: {big:.1f}s at 10x vs {base:.1f}s"
    )
