"""Lloyd's k-means (functions/clustering.py): differential vs a pure-
Python mirror, determinism/edge contracts, and the plan pin."""

import math

import pytest
from pyspark.sql import functions as F

from pd_explain_spark import kmeans_assign, kmeans_fit


def _round_half_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _py_lloyd(vecs: dict, k: int, n_iter: int, scale: int = 1_000_000):
    """Reference Lloyd on quantized ints, same init (md5 order of id),
    same (dist2, cid) tie-break, same HALF_UP centroid rounding."""
    import hashlib

    q = {
        i: [_round_half_away(x * scale) for x in v] for i, v in vecs.items()
    }
    order = sorted(
        q, key=lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i)
    )
    cents = {c: list(q[i]) for c, i in enumerate(order[:k])}

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, cv)), c)
                for c, cv in cents.items()
            )
            out[i] = best[1]
        return out

    for _ in range(n_iter):
        a = assign()
        for c in cents:
            members = [q[i] for i, ci in a.items() if ci == c]
            if members:
                cents[c] = [
                    _round_half_away(sum(col) / len(members))
                    for col in zip(*members)
                ]
    a = assign()
    return cents, a


@pytest.fixture()
def small_vecs():
    # two clear blobs + a straggler; 3-decimal values so quantization is
    # exact in every engine
    return {
        1: [0.100, 0.200, 0.300],
        2: [0.110, 0.190, 0.310],
        3: [0.105, 0.205, 0.295],
        4: [0.900, 0.800, 0.700],
        5: [0.910, 0.790, 0.710],
        6: [0.500, 0.500, 0.500],
    }


def test_kmeans_matches_python_mirror(spark, small_vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in small_vecs.items()], "vec_id long, embedding array<double>"
    )
    want_cents, want_assign = _py_lloyd(small_vecs, k=2, n_iter=3)
    cents = kmeans_fit(df, k=2, n_iter=3)
    assert cents == want_cents
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign(df, k=2, n_iter=3).collect()
    }
    assert got == want_assign


def test_kmeans_dist2_exact_and_deterministic(spark, small_vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in small_vecs.items()], "vec_id long, embedding array<double>"
    )
    a1 = sorted(map(tuple, kmeans_assign(df, k=3, n_iter=2).collect()))
    a2 = sorted(map(tuple, kmeans_assign(df, k=3, n_iter=2).collect()))
    assert a1 == a2
    # dist2 is an exact integer in micro^2 units
    cents, assign = _py_lloyd(small_vecs, k=3, n_iter=2)
    for vec_id, cluster, dist2 in a1:
        q = [_round_half_away(x * 1_000_000) for x in small_vecs[vec_id]]
        cv = cents[assign[vec_id]]
        assert dist2 == sum((a - b) * (a - b) for a, b in zip(q, cv))


def test_kmeans_inertia_never_increases(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    prev = None
    for it in range(4):
        cents = kmeans_fit(emb, k=4, n_iter=it)
        total = (
            kmeans_assign(emb, centroids=cents)
            .agg(F.sum("dist2").alias("s"))
            .first()
            .s
        )
        if prev is not None:
            # Lloyd monotonicity holds up to the per-iteration centroid
            # rounding (+-1 micro-unit per coordinate); allow that slack
            assert total <= prev * 1.001
        prev = total


def test_kmeans_edges(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_fit(empty)
    # fewer vectors than k: one centroid per vector, assignment total
    two = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = kmeans_assign(two, k=5, n_iter=2).collect()
    assert sorted(r.dist2 for r in out) == [0, 0]
    # null vectors are excluded, not crashed on
    withnull = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    assert kmeans_assign(withnull, k=1, n_iter=1).count() == 1


def test_kmeans_plan_is_scalable(spark, sf_dir):
    from pd_explain_spark import assert_scalable

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert_scalable(kmeans_assign(emb, k=4, n_iter=1))


def test_ivf_kmeans_buckets_match_fit_assignment(spark, sf_dir):
    """ivf_build_kmeans's integer argmin must reproduce the fit's own
    cluster memberships exactly (same quantization, same tie-break)."""
    from pd_explain_spark import ivf_build_kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = ivf_build_kmeans(emb, n_centroids=4, n_iter=2)
    got = {r.neighbor_id: r.bucket for r in idx.assigned.collect()}
    want = {
        r.vec_id: r.cluster
        for r in kmeans_assign(emb, k=4, n_iter=2).collect()
    }
    assert got == want
    # centroid table carries real-unit doubles, one row per cluster
    cents = idx.centroids.collect()
    assert sorted(r.bucket for r in cents) == [0, 1, 2, 3]
    assert all(max(abs(x) for x in r.centroid) < 100 for r in cents)


def test_ivf_kmeans_query_and_plan(spark, sf_dir):
    from pd_explain_spark import assert_scalable, ivf_build_kmeans
    from pd_explain_spark.functions.similarity import ivf_query

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = ivf_build_kmeans(emb, n_centroids=8, n_iter=1)
    out = ivf_query(idx, emb.filter("vec_id < 3"), k=3, n_probe=2)
    rows = out.collect()
    assert {r.query_id for r in rows} <= {0, 1, 2}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    assert_scalable(out)


def test_semantic_dedup_fitted_flavor(spark, sf_dir):
    """n_iter > 0 swaps Lloyd-fitted centroids into SemDeDup: pair
    discovery still honors the threshold, survivors stay consistent
    (survivors = corpus minus one side of each duplicate component)."""
    from pd_explain_spark.functions.similarity import (
        semantic_dedup, semantic_dedup_pairs)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = semantic_dedup_pairs(emb, threshold=0.45, n_centroids=8, n_iter=2)
    p = pairs.collect()
    assert all(r.cosine_sim >= 0.4499 for r in p)
    assert all(r.id_a < r.id_b for r in p)
    surv = semantic_dedup(emb, threshold=0.45, n_centroids=8, n_iter=2)
    n_all, n_surv = emb.count(), surv.count()
    dup_ids = {x for r in p for x in (r.id_a, r.id_b)}
    if dup_ids:
        # every component keeps >= 1 representative and drops >= 1 loser
        assert n_all - len(dup_ids) + 1 <= n_surv < n_all
    else:
        assert n_surv == n_all


def test_prototype_prune_fitted_flavor(spark, sf_dir):
    """n_iter > 0 swaps Lloyd-fitted centroids into D4 prototype
    pruning: survivors are a proper per-cluster tail of the corpus."""
    from pd_explain_spark.functions.similarity import prototype_prune, prototype_scores

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scores = prototype_scores(emb, n_centroids=4, n_iter=2)
    assert scores.count() == emb.count()  # no zero-norm vectors here
    kept = prototype_prune(emb, prune_fraction=0.5, n_centroids=4, n_iter=2)
    n_all, n_kept = emb.count(), kept.count()
    # floor(0.5*size) dropped per cluster: strictly fewer rows, at least
    # ceil(size/2) kept per cluster -> at least half overall
    assert n_all // 2 <= n_kept < n_all


def test_semantic_dedup_against_fitted_flavor(spark, sf_dir):
    """n_iter > 0 fits Lloyd centroids on the CORPUS side of the
    incremental SemDeDup: pairs honor the threshold and survivors are
    exactly the new rows with no flagged corpus near-dup."""
    from pd_explain_spark.functions.similarity import (
        semantic_dedup_against, semantic_dedup_pairs_against)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new, corp = emb.filter("vec_id >= 400"), emb.filter("vec_id < 400")
    pairs = semantic_dedup_pairs_against(
        new, corp, threshold=0.45, n_centroids=8, n_iter=2
    )
    p = pairs.collect()
    assert all(r.cosine_sim >= 0.4499 for r in p)
    assert all(r.new_id >= 400 > r.corpus_id for r in p)
    surv = semantic_dedup_against(
        new, corp, threshold=0.45, n_centroids=8, n_iter=2
    )
    flagged = {r.new_id for r in p}
    got = {r.vec_id for r in surv.collect()}
    want = {r.vec_id for r in new.collect()} - flagged
    assert got == want


def test_kmeans_assign_id_contract(spark):
    """The streaming flavor is per-row (duplicate ids each score their
    own vector); the batch flavor's map-combining argmin collapses an
    id group — the documented unique-id precondition. On unique ids the
    two are bit-identical (the parity test); this pins the divergence
    shape so a future edit cannot silently change either contract."""
    from pd_explain_spark.streaming.windows import stream_kmeans_assign

    cents = {0: [0, 0], 1: [1_000_000, 1_000_000]}
    df = spark.createDataFrame(
        [(7, [0.0, 0.0]), (7, [1.0, 1.0]), (8, [0.9, 1.1])],
        "vec_id long, embedding array<double>",
    )
    stream_flavor = sorted(
        (r.vec_id, r.cluster, r.dist2)
        for r in stream_kmeans_assign(df, cents).collect()
    )
    assert stream_flavor == [(7, 0, 0), (7, 1, 0), (8, 1, 20000000000)]
    batch = kmeans_assign(df, centroids=cents).collect()
    assert len(batch) == 2  # one row per unique id (precondition)
    assert {r.vec_id for r in batch} == {7, 8}


def test_ivf_build_fixed_null_vector_seed_no_crash(spark):
    """A NULL-vector row whose id lands in the seed pick must be
    dropped from the centroid table (compact renumber), not crash the
    driver-side seed materialization."""
    from pd_explain_spark.functions.similarity import ivf_build_fixed

    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, None), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = ivf_build_fixed(df, n_centroids=3)
    cents = idx.centroids.collect()
    assert len(cents) == 2
    assert sorted(r.bucket for r in cents) == [0, 1]
    assert all(r.centroid is not None for r in cents)


def test_prototype_scores_zero_norm_never_seeds(spark):
    """A zero-norm vector whose id hashes into the seed set must not
    become a centroid: previously the whole bucket it attracted was
    silently dropped by the zn > 0 guard; now the index is built on
    non-zero-norm vectors only and every scorable row keeps a score."""
    from pd_explain_spark.functions.similarity import prototype_scores

    rows = [(i, [0.1 * (i + 1), 0.2]) for i in range(6)] + [(6, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = prototype_scores(df, n_centroids=7)
    got = {r.vec_id for r in out.collect()}
    # all six non-zero vectors scored; only the zero vector excluded
    assert got == set(range(6))


def test_kmeans_cluster_stats_consistent(spark, sf_dir):
    """Stats reconcile with the assignment: sizes sum to the corpus,
    total_dist2 sums to the global inertia, mean is the rounded ratio."""
    from pd_explain_spark import kmeans_assign, kmeans_cluster_stats

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stats = kmeans_cluster_stats(emb, k=4, n_iter=2).collect()
    a = kmeans_assign(emb, k=4, n_iter=2)
    assert sum(r.n_members for r in stats) == a.count()
    assert sum(r.total_dist2 for r in stats) == a.agg(
        F.sum("dist2")
    ).first()[0]
    for r in stats:
        assert r.mean_dist2 == round(r.total_dist2 / r.n_members)


def test_cluster_balanced_sample_modes(spark, sf_dir):
    """cluster_balanced_sample (r8): exact per-cluster quotas; random
    mode == stratified_sample on the assignment (same md5-seed
    contract); central mode keeps each cluster's lowest-dist2 rows;
    deterministic across runs; WindowGroupLimit plan (no full per-key
    sort)."""
    from collections import Counter

    from pd_explain_spark import cluster_balanced_sample, kmeans_assign, stratified_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = kmeans_assign(emb, k=4, n_iter=2)
    sizes = {r["cluster"]: r["n"] for r in a.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()}

    out = cluster_balanced_sample(emb, k=4, n_iter=2, quota=10, mode="random")
    got = Counter(r["cluster"] for r in out.collect())
    assert got == {c: min(10, n) for c, n in sizes.items() if min(10, n) > 0}

    # random mode is exactly stratified_sample(by=cluster) on the assignment
    strat = stratified_sample(a, by="cluster", quota=10, id_col="vec_id", seed=42)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, strat.collect()))

    # central mode: per cluster, exactly the quota lowest dist2 values
    cen = cluster_balanced_sample(emb, k=4, n_iter=2, quota=5, mode="central")
    by_cluster = {}
    for r in a.collect():
        by_cluster.setdefault(r["cluster"], []).append((r["dist2"], r["vec_id"]))
    expect = {
        (vid, c, d2)
        for c, rows in by_cluster.items()
        for d2, vid in sorted(rows)[:5]
    }
    assert {(r["vec_id"], r["cluster"], r["dist2"]) for r in cen.collect()} == expect

    # determinism + plan shape
    assert sorted(map(tuple, cen.collect())) == sorted(
        map(tuple, cluster_balanced_sample(emb, k=4, n_iter=2, quota=5, mode="central").collect())
    )
    plan = cen._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    with pytest.raises(ValueError):
        cluster_balanced_sample(emb, mode="weird")
