"""Distributed Lloyd's k-means over embedding columns, exactly
reproducible across engines.

The similarity stack's ``ivf_build_fixed`` (similarity.py:372) stops at
seed-init — "KMeans init without the iterations" — because float
centroid means are summation-order-dependent and would never
hash-match an external oracle. This module adds the iterations while
keeping bit-reproducibility, so a FITTED clustering (better bucket
quality for IVF / SemDeDup at the same query cost) can still be
driver-verified:

* vectors are quantized once to integer micro-units
  (``round(x * scale)`` as BIGINT — the ``embedding_quantize``
  precedent), so squared L2 distances are EXACT 64-bit integers with no
  accumulation-order sensitivity;
* assignment ties break on (dist2, centroid_id) — total order,
  engine-independent;
* centroid updates sum exact integers per coordinate (map-combining
  groupBy, < 2^53 so the one double division is exact-input) and round
  HALF_UP back to micro-units — the single rounding site per
  iteration, same rule in Spark and DuckDB;
* init is the md5-order seed pick shared with ``ivf_build_fixed``;
  clusters that lose all members keep their previous centroid.

Scale shape: per iteration one broadcast cross join (k rows) + a
per-vector struct-min argmin (map-side combinable — the k-way fan-out
collapses back to one row per vector BEFORE the exchange) + one
(cid, coord) sum aggregate — k*dim rows collected to the driver, the
same bounded O(k*dim) driver state MLlib's KMeans keeps. The corpus is
scanned once per iteration and never shuffled by key; n_iter is a
small constant. (An all-literal expression argmin was measured 4x
SLOWER here — the k*dim-literal projection defeats whole-stage
codegen — so the broadcast shape is deliberate for batch; the
streaming flavor, where joins/windows are unavailable, uses the
literal ``argmin_struct`` and a parity test pins the two bit-equal.)
PRECONDITION shared by fit/assign: ``id_col`` uniquely identifies rows
(the engine-wide table contract) — rows sharing an id collapse to one
assignment.
Reference scope: the reference engine ships no clustering operator —
this extends SURVEY.md §2's similarity family (ivf_build_fixed,
semantic_dedup) with the fitted-centroid flavor the 100 TB pipeline
brief calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_int

__all__ = [
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_cluster_stats",
    "cluster_balanced_sample",
]


def _quantized(df: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x * scale).cast("bigint")
        ).alias("q"),
    )


def argmin_struct(cents: dict[int, list[int]], qcol: str = "q"):
    """Column expression picking the (dist2, cid) argmin of the
    quantized vector column ``qcol`` against the model's centroids:
    each centroid's exact integer squared L2 inlines as a literal-array
    zip_with fold, and ``array_min`` over (d2, cid) structs implements
    the total-order tie-break. Shared by the batch and streaming
    assignment flavors — one definition, bit-identical everywhere.
    Returns a struct column with fields ``d2`` and ``cid``."""
    structs = []
    for cid, cq in sorted(cents.items()):
        lit_cq = F.array(*[F.lit(int(x)).cast("bigint") for x in cq])
        d2 = F.aggregate(
            F.zip_with(F.col(qcol), lit_cq, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(d2.alias("d2"), F.lit(int(cid)).cast("int").alias("cid"))
        )
    return F.array_min(F.array(*structs))


def _assign(
    q: DataFrame, cents: dict[int, list[int]], carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, q, *carry) x broadcast centroids -> (id, cid, q, dist2,
    *carry): exact integer squared L2, argmin via one MAP-COMBINING
    struct-min aggregate (ties to the lowest centroid id) — the k-way
    cross-join fan-out collapses back to one row per id before the
    exchange. ``carry`` columns ride along unchanged (they are constant
    within an id group). PRECONDITION: ``id`` uniquely identifies rows
    (see module docstring) — duplicate ids collapse to one row whose
    argmin mixes their vectors; validate upstream if ids can repeat."""
    spark = q.sparkSession
    # identity limit: states the O(k) bound in the plan — a bare
    # createDataFrame leaf prints as Scan ExistingRDD, which the audit
    # deliberately does NOT classify as bounded
    cdf = spark.createDataFrame(
        sorted(cents.items()), "cid int, cq array<bigint>"
    ).limit(len(cents))
    d2 = F.aggregate(
        F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # q (and carry cols) are identical on every row of the id group;
    # max() just carries them through the aggregate
    aggs = [F.min("s").alias("m"), F.max("q").alias("q")] + [
        F.max(c).alias(c) for c in carry
    ]
    return (
        q.crossJoin(F.broadcast(cdf))
        .select("id", "q", *carry, F.struct(d2.alias("d2"), "cid").alias("s"))
        .groupBy("id")
        .agg(*aggs)
        .select(
            "id", F.col("m.cid").alias("cid"), "q", F.col("m.d2").alias("d2"),
            *carry,
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> dict[int, list[int]]:
    """Fit k centroids with ``n_iter`` Lloyd iterations; returns
    {centroid_id: [micro-unit BIGINT components]} — bounded O(k*dim)
    driver state. Fewer than k non-null vectors seed fewer centroids.
    Raises ValueError on an empty input (model-entry contract)."""
    q = _quantized(df, id_col, vec_col, scale)
    # two bounded driver jobs: seed IDS from an id-only TakeOrdered (the
    # vector subtree prunes away), then the k seed VECTORS behind an IN
    # filter that pushes to the scan — never a full vector pass just to
    # pick seeds (the ivf_build_fixed materialize-once pattern)
    seed_ids = [
        r.id
        for r in q.select("id")
        .withColumn("__h", md5_int(F.md5(F.col("id").cast("string"))))
        .orderBy("__h", "id")
        .limit(k)
        .collect()
    ]
    if not seed_ids:
        raise ValueError("kmeans_fit requires at least one non-null vector")
    by_id = {r.id: list(r.q) for r in q.filter(F.col("id").isin(seed_ids)).collect()}
    cents = {i: by_id[v] for i, v in enumerate(seed_ids)}
    for _ in range(n_iter):
        upd = (
            _assign(q, cents)
            .select("cid", F.posexplode("q").alias("j", "v"))
            .groupBy("cid", "j")
            .agg(F.round(F.sum("v") / F.count("v")).cast("bigint").alias("c"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in upd:
            by_cid.setdefault(r.cid, {})[r.j] = r.c
        cents = {
            cid: [by_cid[cid][j] for j in range(len(old))]
            if cid in by_cid
            else old  # emptied cluster keeps its previous centroid
            for cid, old in cents.items()
        }
    return cents


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    centroids: dict[int, list[int]] | None = None,
) -> DataFrame:
    """Cluster membership after a fitted (or supplied) k-means model:
    (id_col, cluster INT, dist2 BIGINT) with dist2 the exact integer
    squared L2 distance in micro^2 units — every value hash-portable."""
    if centroids is None:
        centroids = kmeans_fit(df, k, n_iter, id_col, vec_col, scale)
    out = _assign(_quantized(df, id_col, vec_col, scale), centroids)
    return out.select(
        F.col("id").alias(id_col),
        F.col("cid").alias("cluster"),
        F.col("d2").alias("dist2"),
    )


def kmeans_cluster_stats(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    centroids: dict[int, list[int]] | None = None,
) -> DataFrame:
    """Per-cluster fit diagnostics: (cluster, n_members, total_dist2,
    mean_dist2) — sizes expose bucket skew (the knob SemDeDup/IVF cost
    depends on), total_dist2 is the exact integer inertia contribution
    (micro^2 units), mean_dist2 = total/n rounded to 4 decimals. One
    map-combining aggregate over the assignment; every value is
    hash-portable — exact integers throughout (the mean rounds to a
    whole micro^2 unit: 4-decimal rounding of a ~1e12 double is NOT
    bit-stable across engines), so the whole fit quality report is
    oracle-checkable."""
    a = kmeans_assign(df, k, n_iter, id_col, vec_col, scale, centroids)
    return (
        a.groupBy(F.col("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist2").alias("total_dist2"),
        )
        .select(
            "cluster",
            F.col("n_members").cast("long").alias("n_members"),
            "total_dist2",
            F.round(F.col("total_dist2") / F.col("n_members"))
            .cast("bigint")
            .alias("mean_dist2"),
        )
    )


def cluster_balanced_sample(
    df: DataFrame,
    k: int = 8,
    quota: int = 100,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    seed: int = 42,
    mode: str = "random",
    centroids: dict[int, list[int]] | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Diversity-balanced corpus sampling: fit (or reuse via
    ``centroids=``) a k-means model over the embedding column, then keep
    an EXACT per-cluster quota — the cluster-balanced selection step of
    embedding-based curation (SemDeDup-style pipelines sample per
    cluster to preserve semantic coverage; ``dsir_sample`` balances by
    target likeness, this balances by topic coverage).

    ``mode="random"``: within each cluster, rows ordered by the seeded
    md5 key md5("<id>-<seed>") (ties by id) — an unbiased quota, the
    ``stratified_sample`` contract with the fitted cluster as the
    stratum. ``mode="central"``: closest-to-centroid first (exact
    integer dist2, ties by id) — cluster prototypes, the summary
    sample. Returns (id_col, cluster, dist2) for the selected rows;
    join back on ``id_col`` for payloads.

    Scale shape: assignment is one corpus scan against O(k*dim)
    broadcast state (see module docstring); the quota is the two-phase
    salted top-n (``stratified_sample``'s skew ceiling — phase 1 ranks
    within (cluster, salt), phase 2 over <= quota*salt_buckets
    survivors), so a cluster holding half the corpus never funnels into
    one task and both phases compile to WindowGroupLimit."""
    from pyspark.sql import Window

    if mode not in ("random", "central"):
        raise ValueError(f"mode must be 'random' or 'central', got {mode!r}")
    a = kmeans_assign(df, k, n_iter, id_col, vec_col, scale, centroids)
    if mode == "random":
        order = [
            F.md5(F.concat_ws("-", F.col(id_col).cast("string"), F.lit(str(seed)))),
            F.col(id_col),
        ]
    else:
        order = [F.col("dist2"), F.col(id_col)]
    salted = a.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("cluster", "__salt").orderBy(*order)
    phase1 = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= quota)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy("cluster").orderBy(*order)
    return (
        phase1.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )
