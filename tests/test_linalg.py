"""Exact-integer distributed PCA (functions/linalg.py): planted-
direction recovery, exact moment arithmetic, chunked-partial
exactness, projection semantics, and determinism."""

import math

import pytest

from pd_explain_spark.functions.linalg import (
    _CHUNK,
    _emit_chunks,
    gram_moments,
    pca_component_table,
    pca_power_fit,
    pca_project,
    pca_topk,
)


def _planted(spark, n=200, d=8, spread=9.0):
    """n vectors = t*u + small deterministic noise, dominant direction
    u = (1, -1, 0, ...)/sqrt(2); eigengap is huge so power iteration
    locks on within a few steps."""
    u = [1.0 / math.sqrt(2), -1.0 / math.sqrt(2)] + [0.0] * (d - 2)
    rows = []
    for i in range(n):
        t = spread * math.sin(i * 1.7)               # big variance along u
        noise = [0.01 * math.cos(i * (j + 2) * 0.37) for j in range(d)]
        rows.append((i, [t * u[j] + noise[j] for j in range(d)]))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"), u


def test_gram_moments_exact_tiny(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, -4.0]), (2, [0.5, 0.25]), (3, None)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    n, sums, S = gram_moments(df, scale=100)
    q = [[100, 200], [300, -400], [50, 25]]
    assert n == 3
    assert sums == [sum(r[0] for r in q), sum(r[1] for r in q)]
    for i in range(2):
        for j in range(2):
            assert S[i][j] == sum(r[i] * r[j] for r in q)


def test_emit_chunks_reassembles_huge_values():
    for v in (0, 5, -(2**62) - 17, 3 * _CHUNK + 123, -7 * _CHUNK):
        rows: list = []
        _emit_chunks(rows, 1, 2, v)
        assert sum(r[2] for r in rows) == v
        assert all(abs(r[2]) <= _CHUNK and r[:2] == (1, 2) for r in rows)


def test_pca_recovers_planted_direction(spark):
    df, u = _planted(spark)
    fit = pca_power_fit(df, n_iter=12)
    comp = fit["component"]
    norm = math.sqrt(sum(x * x for x in comp))
    cos = abs(sum(c * ui for c, ui in zip(comp, u))) / norm
    assert cos > 0.999
    assert fit["evr"] > 0.99          # one direction carries the variance
    assert fit["eigval"] > 0
    # determinism: refit is bit-identical
    fit2 = pca_power_fit(df, n_iter=12)
    assert fit2["component_q"] == fit["component_q"]
    assert fit2["eigval_micro"] == fit["eigval_micro"]


def test_pca_projection_exact_and_rank_consistent(spark):
    df, _ = _planted(spark, n=50)
    fit = pca_power_fit(df, n_iter=12)
    rows = {r["vec_id"]: r for r in pca_project(df, fit).collect()}
    pdf = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for vid, emb in pdf.items():
        q = [math.floor(x * fit["scale"] + 0.5) if x >= 0
             else -math.floor(-x * fit["scale"] + 0.5) for x in emb]
        expect = sum(a * b for a, b in zip(q, fit["component_q"]))
        assert rows[vid]["score_q"] == expect
    # centering is a constant shift: raw and centered rank identically
    by_raw = sorted(rows, key=lambda v: (-rows[v]["score_q"], v))
    by_cen = sorted(rows, key=lambda v: (-rows[v]["score_c_micro"], v))
    top = pca_topk(df, fit, k=5).collect()
    assert [r["vec_id"] for r in top] == by_raw[:5]
    # micro-rounding can tie near-equal scores; the ordering must agree
    # wherever centered scores are distinct
    assert by_raw[:3] == by_cen[:3]


def test_pca_component_table_shape(spark):
    df, _ = _planted(spark, n=40, d=4)
    fit = pca_power_fit(df, n_iter=6)
    out = pca_component_table(spark, fit).collect()
    assert [r["dim"] for r in out] == [0, 1, 2, 3]
    assert [r["loading_q"] for r in out] == fit["component_q"]
    assert len({r["eigval_micro"] for r in out}) == 1


def test_pca_degenerate_and_guards(spark):
    const = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(5)], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    fit = pca_power_fit(const, n_iter=4)   # zero covariance: early stop
    assert fit["eigval"] == 0.0 and fit["evr"] == 0.0
    empty = const.filter("vec_id < 0")
    with pytest.raises(ValueError):
        gram_moments(empty)
    with pytest.raises(ValueError):
        pca_power_fit(const, n_iter=0)
    with pytest.raises(ValueError):
        pca_topk(const, fit, k=0)


def test_pca_residuals_flag_off_direction_vector(spark):
    """A vector orthogonal to the dominant direction carries the top
    residual; a vector ALONG the direction has ~zero residual even when
    its projection is huge."""
    df, u = _planted(spark, n=100, d=8)
    # id 900: big along u (residual ~ 0); id 901: big along e3 (orthogonal)
    along = [(900, [30.0 * x for x in u])]
    ortho = [(901, [0.0, 0.0, 0.0, 25.0, 0.0, 0.0, 0.0, 0.0])]
    full = df.union(spark.createDataFrame(along + ortho, df.schema))
    from pd_explain_spark.functions.linalg import (
        pca_power_fit,
        pca_residual_topk,
        pca_residuals,
    )

    fit = pca_power_fit(full, n_iter=12)
    top = pca_residual_topk(full, fit, k=1).collect()
    assert top[0]["vec_id"] == 901
    r = {x["vec_id"]: x["resid2_micro"] for x in pca_residuals(full, fit).collect()}
    # orthogonal magnitude ~25² = 625 units²; along-direction vector
    # contributes ~nothing beyond the noise floor
    assert r[901] > 500_000_000        # > 500 units² in micro
    assert r[900] < 5_000_000          # < 5 units²
    # exact arithmetic pin: recompute id 901's metric in pure Python
    import math

    n, d = fit["n"], fit["dim"]
    vq, sums, scale = fit["component_q"], fit["sums"], fit["scale"]
    emb = [0.0, 0.0, 0.0, 25.0, 0.0, 0.0, 0.0, 0.0]
    q = [math.floor(x * scale + 0.5) for x in emb]
    nq = [n * q[i] - sums[i] for i in range(d)]
    A = sum(x * x for x in nq)
    C = sum(nq[i] * vq[i] for i in range(d))
    D = sum(x * x for x in vq)
    m = A * D - C * C
    expect = math.floor(
        ((float(m) / float(n * n)) / float(D)) / float(scale * scale)
        * 1_000_000.0 + 0.5
    )
    assert r[901] == expect
    with pytest.raises(ValueError):
        pca_residual_topk(full, fit, k=0)


def test_pca_second_component_recovers_second_direction(spark):
    """Two planted directions of different strength: deflation recovers
    the weaker one, near-orthogonal to PC1, and the two explained
    ratios match a numpy eigendecomposition of the same quantized
    covariance."""
    import numpy as np

    from pd_explain_spark.functions.linalg import pca_second_component

    rows = []
    for i in range(300):
        t1 = 9.0 * math.sin(i * 1.7)
        t2 = 4.0 * math.cos(i * 0.9)
        noise = [0.01 * math.cos(i * (j + 2) * 0.37) for j in range(8)]
        v = list(noise)
        v[0] += t1
        v[1] += t2
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    fit = pca_power_fit(df, n_iter=12)
    sec = pca_second_component(fit)
    c1 = np.array(fit["component"]); c1 = c1 / np.linalg.norm(c1)
    c2 = np.array(sec["component2"]); c2 = c2 / np.linalg.norm(c2)
    assert abs(c1[0]) > 0.999 and abs(c2[1]) > 0.999
    assert abs(float(c1 @ c2)) < 1e-3
    X = np.array([r[1] for r in rows])
    w, _ = np.linalg.eigh(np.cov(np.round(X * 1e6).T, bias=True))
    assert abs(sec["evr2"] - w[-2] / w.sum()) < 1e-4
    assert sec["eigval2"] < fit["eigval"]
    # determinism
    assert pca_second_component(fit)["component2_q"] == sec["component2_q"]


def test_merged_shard_moments_equal_whole_corpus_fit(spark):
    """The sketch-family mergeability contract for PCA: per-shard
    gram_moments merged == whole-corpus moments, and the fit from the
    merged moments is bit-identical to fitting the full frame."""
    from pd_explain_spark.functions.linalg import (
        merge_moments,
        pca_fit_from_moments,
    )

    df, _ = _planted(spark, n=120)
    whole = pca_power_fit(df, n_iter=10)
    m1 = gram_moments(df.filter("vec_id % 3 = 0"))
    m2 = gram_moments(df.filter("vec_id % 3 = 1"))
    m3 = gram_moments(df.filter("vec_id % 3 = 2"))
    merged = merge_moments(merge_moments(m1, m2), m3)
    assert merged == gram_moments(df)
    refit = pca_fit_from_moments(merged, n_iter=10)
    assert refit["component_q"] == whole["component_q"]
    assert refit["eigval_micro"] == whole["eigval_micro"]
    assert refit["evr_micro"] == whole["evr_micro"]
    with pytest.raises(ValueError):
        merge_moments(m1, gram_moments(
            spark.createDataFrame([(0, [1.0, 2.0]), (1, [2.0, 1.0])],
                                  "vec_id BIGINT, embedding ARRAY<DOUBLE>")))
