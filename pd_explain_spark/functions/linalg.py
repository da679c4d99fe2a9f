"""Distributed linear algebra over embedding columns: PCA that is
exactly reproducible across engines.

Principal components are the standard preprocessing for the embedding
pipeline this repo ships (whitening / dimensionality reduction before
IVF bucketing, drift direction analysis, corpus visualization), but a
naive distributed PCA is NOT verifiable: float covariance sums are
summation-order-dependent and eigensolvers are library-specific. This
module makes the whole thing bit-reproducible with the clustering
module's recipe (clustering.py — quantize once to integer micro-units,
keep every accumulation an exact integer, round at ONE site per
iteration with one rule):

* `gram_moments`: ONE corpus scan computes exact integer second
  moments (count, per-dim sums, upper-triangular Gram matrix of the
  quantized vectors) via Arrow-batched per-partition partials —
  O(dim^2) state per partition, O(partitions * dim^2) shuffle rows,
  the corpus itself never shuffles. Partials accumulate in arbitrary-
  precision Python ints and are emitted in <= 2^62 chunks, so no
  int64 overflow at any corpus size; the final roll-up sums
  DECIMAL(38,0).
* `pca_power_fit`: driver-side power iteration on the EXACT integer
  centered-moment matrix C[i][j] = n*S[i][j] - sums[i]*sums[j]
  (= n^2 * scale^2 * population covariance). The iterate stays an
  integer vector normalized to max|v| = v_scale; the only float ops
  per iteration (w/max then floor(x*v_scale + 0.5)) run on identical
  exact-integer inputs in any engine, so a DuckDB HUGEINT mirror
  reproduces every iterate bit-for-bit. O(dim^2) driver state — same
  contract as the k-means centroid collect.
* `pca_project` / `pca_topk`: corpus projection onto the fitted
  component as an exact integer dot product (scan-stage zip_with
  fold, no shuffle), plus the mean-centered score in micro-units;
  top-k via TakeOrdered, never a global sort.

Determinism bound: per-Arrow-batch Gram partials use numpy int64 —
exact while rows_per_batch * (scale * max|x|)^2 < 2^63 (~10k-row
batches leave ~6 orders of magnitude of headroom for unit-scale
embeddings at scale=1e6); cross-batch accumulation is arbitrary
precision. The reference engine ships no linear algebra operator —
this extends the similarity/clustering family (SURVEY.md §2 extension)
with the component-analysis step of an embedding curation pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "gram_moments",
    "pca_power_fit",
    "pca_second_component",
    "pca_component_table",
    "pca_project",
    "pca_topk",
    "pca_residuals",
    "pca_residual_topk",
    "merge_moments",
    "pca_fit_from_moments",
]

_CHUNK = 1 << 62


def _emit_chunks(rows: list, i: int, j: int, v: int) -> None:
    """Append (i, j, v) split into int64-safe chunks: exact under any
    accumulation size, downstream roll-up re-sums in DECIMAL(38,0)."""
    while v > _CHUNK or v < -_CHUNK:
        c = _CHUNK if v > 0 else -_CHUNK
        rows.append((i, j, c))
        v -= c
    rows.append((i, j, int(v)))


def gram_moments(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> tuple[int, list[int], list[list[int]]]:
    """Exact integer second moments of the quantized vector column in
    ONE scan: returns (n, sums, S) where q = round(x * scale) per
    coordinate (the clustering/quantization contract), sums[i] =
    Σ q_i, and S[i][j] = Σ q_i * q_j (full symmetric dim x dim,
    mirrored from the upper triangle). All values are exact Python
    ints — no float accumulation anywhere."""
    q = df.filter(F.col(vec_col).isNotNull()).select(
        F.transform(
            F.col(vec_col), lambda x: F.round(x * scale).cast("bigint")
        ).alias("q")
    )

    def part(batches):
        import numpy as np
        import pandas as pd

        d = None
        S = None
        sums = None
        cnt = 0
        LIM = 1 << 62  # headroom under int64: chunk_rows * A^2 stays < 2^62
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            if d is None:
                d = M.shape[1]
                S = [[0] * d for _ in range(d)]
                sums = [0] * d
            # int64 matmul wraps SILENTLY on overflow, and the margin
            # depends on arrow batch size x max|q|^2 (ADVICE r9): bound
            # it at runtime — chunk rows so each partial Gram is exact,
            # and fall back to exact Python-int (object dtype) matmul
            # when even a single row's A^2 would wrap
            A = int(np.max(np.abs(M))) if M.size else 0
            if A and A * A >= LIM:
                Mo = M.astype(object)
                chunks = [(Mo.T @ Mo, Mo.sum(axis=0))]
            else:
                step = len(M) if A == 0 else max(1, LIM // (A * A))
                chunks = []
                for lo in range(0, len(M), step):
                    Mc = M[lo:lo + step]
                    # step*A^2 < 2^62 bounds both the Gram entries and
                    # the column sums (step*A <= 2^62/A <= 2^62)
                    chunks.append((Mc.T @ Mc, Mc.sum(axis=0)))
            for G, s in chunks:
                for i in range(d):
                    sums[i] += int(s[i])
                    Gi = G[i]
                    Si = S[i]
                    for j in range(i, d):
                        Si[j] += int(Gi[j])
            cnt += len(pdf)
        rows: list = []
        if d is not None:
            for i in range(d):
                _emit_chunks(rows, i, -1, sums[i])
                for j in range(i, d):
                    _emit_chunks(rows, i, j, S[i][j])
        rows.append((-1, -1, cnt))
        yield pd.DataFrame(rows, columns=["i", "j", "v"])

    parts = q.mapInPandas(part, "i int, j int, v long")
    agg = (
        parts.groupBy("i", "j")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    n = 0
    sums_d: dict[int, int] = {}
    tri: dict[tuple[int, int], int] = {}
    for r in agg:
        i, j, s = r["i"], r["j"], int(r["s"])
        if i == -1:
            n = s
        elif j == -1:
            sums_d[i] = s
        else:
            tri[(i, j)] = s
    if n == 0:
        raise ValueError("gram_moments: no non-null vectors")
    d = len(sums_d)
    sums = [sums_d[i] for i in range(d)]
    S = [[0] * d for _ in range(d)]
    for (i, j), s in tri.items():
        S[i][j] = s
        S[j][i] = s
    return n, sums, S


def pca_power_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_iter: int = 6,
    scale: int = 1_000_000,
    v_scale: int = 1_000_000,
) -> dict:
    """Fit the dominant principal component by ``n_iter`` power-
    iteration steps over the exact integer centered-moment matrix
    C = n*S - sums sumsᵀ (= n² scale² * population covariance; scaling
    never changes eigenvectors). The iterate v stays an integer vector
    with max|v| = v_scale: each step computes w = C v exactly, then
    v' = floor(w / max|w| * v_scale + 0.5) — the single rounding site,
    identical-input IEEE in every engine. Returns the fit dict:
    n, dim, component_q (integer loadings), component (max-abs-
    normalized floats), eigval / eigval_micro (population-covariance
    eigenvalue in data units², via the exact-integer Rayleigh
    quotient), evr / evr_micro (explained-variance ratio vs the exact
    trace), plus sums/scale/v_scale for projection.

    Convergence: standard power iteration — linear in the eigengap
    ratio; n_iter is a small fixed constant so the oracle mirror
    unrolls one CTE stage per step (the kmeans_fit precedent). A
    zero matrix (constant corpus) stops early and reports eigval 0."""
    if n_iter < 1:
        raise ValueError(f"pca_power_fit: n_iter must be >= 1, got {n_iter}")
    moments = gram_moments(df, vec_col, scale)
    return pca_fit_from_moments(
        moments, n_iter=n_iter, scale=scale, v_scale=v_scale
    )


def _power_iterate(C: list, d: int, n_iter: int, v_scale: int) -> list[int]:
    vq = [v_scale] * d
    for _ in range(n_iter):
        w = [sum(C[i][j] * vq[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:  # zero matrix: any direction is an eigenvector
            break
        vq = [math.floor(float(wi) / float(m) * v_scale + 0.5) for wi in w]
    return vq


def _rayleigh(C: list, vq: list[int], n: int, scale: int):
    num = sum(vq[i] * C[i][j] * vq[j] for i in range(len(vq)) for j in range(len(vq)))
    den = sum(x * x for x in vq)
    trace = sum(C[i][i] for i in range(len(vq)))
    lam = ((float(num) / float(den)) / float(n * n)) / float(scale * scale)
    evr = (float(num) / float(den)) / float(trace) if trace > 0 else 0.0
    return num, den, lam, evr


def pca_second_component(
    fit: dict,
    n_iter: int | None = None,
    r_scale: int = 1_000,
) -> dict:
    """The SECOND principal component by exact-integer deflation of a
    :func:`pca_power_fit` result: with r = PC1 re-quantized to
    max|r| = ``r_scale`` (the coarser scale keeps every deflation
    product inside 128-bit integer range), the deflated matrix

        C2 = floor((D2² · C - N2 · r rᵀ) / 1e12),   D2 = rᵀr, N2 = rᵀCr

    is integer arithmetic with ONE identical-rule rounding site (the
    1e12 down-rescale — float(int)/1e12 then floor, the same op class
    the iteration already uses), so a HUGEINT SQL mirror reproduces it
    bit-for-bit; the same power iteration then runs on C2. The
    eigenvalue / explained-ratio report uses the ORIGINAL C (Rayleigh
    quotient of the fitted direction), not the deflated scale.

    Deflation residue: r carries PC1 at 1/r_scale precision, so C2
    retains O(λ1/r_scale²) of the removed direction — negligible next
    to any λ2 within ~5 orders of magnitude of λ1. Returns
    {component2_q, component2, eigval2, eigval2_micro, evr2,
    evr2_micro}."""
    C = fit["_C"]
    d = fit["dim"]
    n_iter = fit["_n_iter"] if n_iter is None else n_iter
    rq = [math.floor(float(v) / float(r_scale) + 0.5) for v in fit["component_q"]]
    D2 = sum(x * x for x in rq)
    if D2 == 0:
        raise ValueError("pca_second_component: degenerate first component")
    N2 = sum(rq[i] * C[i][j] * rq[j] for i in range(d) for j in range(d))
    C2 = [
        [
            math.floor(float(D2 * D2 * C[i][j] - N2 * rq[i] * rq[j]) / 1e12)
            for j in range(d)
        ]
        for i in range(d)
    ]
    uq = _power_iterate(C2, d, n_iter, fit["v_scale"])
    _, _, lam2, evr2 = _rayleigh(C, uq, fit["n"], fit["scale"])
    return {
        "component2_q": uq,
        "component2": [x / fit["v_scale"] for x in uq],
        "eigval2": lam2,
        "eigval2_micro": math.floor(lam2 * 1_000_000.0 + 0.5),
        "evr2": evr2,
        "evr2_micro": math.floor(evr2 * 1_000_000.0 + 0.5),
    }


def pca_component_table(spark: SparkSession, fit: dict) -> DataFrame:
    """The fit as a driver-hashable frame: one row per dimension —
    (dim, loading_q, eigval_micro, evr_micro). Bounded literal frame
    (dim rows)."""
    rows = [
        (i, int(fit["component_q"][i]), int(fit["eigval_micro"]), int(fit["evr_micro"]))
        for i in range(fit["dim"])
    ]
    return spark.createDataFrame(
        rows, "dim INT, loading_q BIGINT, eigval_micro BIGINT, evr_micro BIGINT"
    ).limit(len(rows))


def pca_project(
    df: DataFrame,
    fit: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the fitted component: (id, score_q,
    score_c_micro) where score_q = Σ q_i * component_q_i is the exact
    integer raw projection (scan-stage zip_with fold — zero shuffle)
    and score_c_micro is the mean-centered projection of the max-abs-
    normalized component in micro-units: (score_q - K/n) / (scale *
    v_scale) with K = Σ sums_i * component_q_i exact. Centering
    subtracts a constant, so score_q and score_c_micro rank
    identically."""
    scale, v_scale = fit["scale"], fit["v_scale"]
    vq = fit["component_q"]
    vq_lit = F.array(*[F.lit(int(x)).cast("bigint") for x in vq])
    q = F.transform(F.col(vec_col), lambda x: F.round(x * scale).cast("bigint"))
    score = F.aggregate(
        F.zip_with(q, vq_lit, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    k_over_n = float(sum(fit["sums"][j] * vq[j] for j in range(fit["dim"]))) / float(
        fit["n"]
    )
    centered = (score.cast("double") - F.lit(k_over_n)) / F.lit(
        float(scale * v_scale)
    )
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        score.alias("score_q"),
        F.floor(centered * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("score_c_micro"),
    )


def pca_topk(
    df: DataFrame,
    fit: dict,
    k: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The k most extreme documents along the fitted component
    (largest projection first, id tiebreak) — the 'what does this
    direction mean' inspection sample. limit() after orderBy plans as
    TakeOrderedAndProject: a per-partition heap + driver merge, never
    a global sort."""
    if k < 1:
        raise ValueError(f"pca_topk: k must be >= 1, got {k}")
    return (
        pca_project(df, fit, id_col=id_col, vec_col=vec_col)
        .orderBy(F.col("score_q").desc(), F.col(id_col))
        .limit(k)
    )

def pca_residuals(
    df: DataFrame,
    fit: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Residual distance from the fitted principal direction — the
    embedding ANOMALY score: vectors far from the corpus's dominant
    direction are the off-manifold outliers a curation pass inspects
    (corrupt encodes, wrong-modality rows, adversarial content).
    Returns (id, resid2_micro) where resid2 = ||c||² - (c·v_unit)² of
    the mean-centered vector, in data units², micro-rounded.

    Exactness: with nq_i = n*q_i - sums_i (the mean-centered vector
    scaled by n*scale — an exact integer), A = Σ nq_i², C = nq·vq and
    D = Σ vq² are exact integers, and resid2 = (A*D - C²) /
    (n²·scale²·D). A and the final products run in DECIMAL(38,0)
    (A*D ≲ 1e35 at n=1e5-scale corpora — document the bound before
    fitting larger corpora at scale=1e6), so the score reproduces
    bit-for-bit in any engine with 128-bit integers. One scan-stage
    pass per row — zero shuffle."""
    return _pca_residuals_with_metric(df, fit, id_col, vec_col).select(
        id_col, "resid2_micro"
    )


def _pca_residuals_with_metric(
    df: DataFrame,
    fit: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pca_residuals plus the internal exact-integer ranking metric
    ``__m`` (DECIMAL(38,0)) — the column the top-k cut orders on; kept
    off the public return so the documented (id, resid2_micro) schema
    holds."""
    scale, v_scale = fit["scale"], fit["v_scale"]
    n, d = fit["n"], fit["dim"]
    vq = fit["component_q"]
    D = sum(x * x for x in vq)
    dec = "decimal(38,0)"
    sums_lit = F.array(*[F.lit(int(s)).cast("bigint") for s in fit["sums"]])
    vq_lit = F.array(*[F.lit(int(x)).cast("bigint") for x in vq])
    q = F.transform(F.col(vec_col), lambda x: F.round(x * scale).cast("bigint"))
    nq = F.zip_with(q, sums_lit, lambda a, b: a * F.lit(int(n)) - b)
    a_sum = F.aggregate(
        F.transform(nq, lambda x: x.cast(dec) * x),
        F.lit(0).cast(dec),
        lambda acc, x: acc + x,
    )
    c_val = F.aggregate(
        F.zip_with(nq, vq_lit, lambda a, b: a.cast(dec) * b),
        F.lit(0).cast(dec),
        lambda acc, x: acc + x,
    )
    m = a_sum * F.lit(int(D)).cast(dec) - c_val * c_val
    r2 = (
        (m.cast("double") / F.lit(float(n * n)))
        / F.lit(float(D))
    ) / F.lit(float(scale * scale))
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        m.alias("__m"),
        F.floor(r2 * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("resid2_micro"),
    )


def pca_residual_topk(
    df: DataFrame,
    fit: dict,
    k: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The k vectors FURTHEST from the fitted principal direction —
    ranked on the exact integer residual numerator (ties break on id),
    so the cut is engine-reproducible even where micro-rounding
    collides. TakeOrderedAndProject, never a global sort."""
    if k < 1:
        raise ValueError(f"pca_residual_topk: k must be >= 1, got {k}")
    return (
        _pca_residuals_with_metric(df, fit, id_col=id_col, vec_col=vec_col)
        .orderBy(F.col("__m").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "resid2_micro")
    )

def merge_moments(
    a: tuple[int, list[int], list[list[int]]],
    b: tuple[int, list[int], list[list[int]]],
) -> tuple[int, list[int], list[list[int]]]:
    """Merge two :func:`gram_moments` results: exact integer moments
    are commutative + associative sums, so per-shard (or per-day)
    moments roll up into the corpus fit without rescanning — the same
    mergeability contract as the CMS/Bloom/HLL/histogram sketch family,
    which makes the PCA fit INCREMENTAL: keep yesterday's (n, sums, S),
    add today's shard, re-run the driver iteration (milliseconds) on
    the merged moments."""
    n1, s1, g1 = a
    n2, s2, g2 = b
    if len(s1) != len(s2):
        raise ValueError(
            f"merge_moments: dimension mismatch {len(s1)} vs {len(s2)}"
        )
    d = len(s1)
    return (
        n1 + n2,
        [s1[i] + s2[i] for i in range(d)],
        [[g1[i][j] + g2[i][j] for j in range(d)] for i in range(d)],
    )


def pca_fit_from_moments(
    moments: tuple[int, list[int], list[list[int]]],
    n_iter: int = 6,
    scale: int = 1_000_000,
    v_scale: int = 1_000_000,
) -> dict:
    """:func:`pca_power_fit` from precomputed (possibly merged)
    moments — the score-side of the incremental contract. Identical
    output to fitting the concatenated corpus directly (pytest-pinned:
    shard moments merged == whole-corpus fit, bit for bit)."""
    n, sums, S = moments
    if n < 2:
        raise ValueError(f"pca_fit_from_moments: need >= 2 vectors, got {n}")
    d = len(sums)
    C = [[n * S[i][j] - sums[i] * sums[j] for j in range(d)] for i in range(d)]
    vq = _power_iterate(C, d, n_iter, v_scale)
    num, den, lam, evr = _rayleigh(C, vq, n, scale)
    return {
        "n": n,
        "dim": d,
        "scale": scale,
        "v_scale": v_scale,
        "sums": sums,
        "component_q": vq,
        "component": [x / v_scale for x in vq],
        "eigval": lam,
        "eigval_micro": math.floor(lam * 1_000_000.0 + 0.5),
        "evr": evr,
        "evr_micro": math.floor(evr * 1_000_000.0 + 0.5),
        "_C": C,
        "_n_iter": n_iter,
    }
