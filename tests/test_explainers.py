"""Explainer tests.

Stronger than the reference's smoke-only policy (tests/test_explainers.py:4-6
'do not check the actual explanations'): we pin deterministic outputs where
the kernel is exactly computable, and smoke-check structure elsewhere.
"""

import numpy as np
import pytest

from pd_explain_spark import to_explainable


# ---------------------------------------------------------------- fedex
def test_fedex_filter_finds_planted_shift(spark):
    """Plant an obvious deviation: filtering x>0 wipes out category 'b'."""
    rows = [(float(i % 7 - 3), "a" if i % 7 > 2 else "b", float(i)) for i in range(980)]
    df = to_explainable(spark.createDataFrame(rows, ["x", "cat", "noise"]), name="planted")
    out = df[df["x"] > 0]
    exp = out.explain(top_k=2)
    assert exp.items, "expected at least one explanation"
    top = exp.items[0]
    assert top.attribute == "cat"
    assert top.bin == "b"
    assert "less than before" in top.explanation or "disappears" in top.explanation


def test_fedex_filter_correlation_pruning(spark):
    rows = [(float(i), float(i) * 2.0, float(i % 5)) for i in range(200)]
    df = to_explainable(spark.createDataFrame(rows, ["x", "x2", "z"]), name="corr")
    out = df[df["x"] > 100]
    exp = out.explain(top_k=3)
    # x2 is perfectly correlated with the filter column -> excluded
    assert "x2" in exp.extras["cor_deleted_atts"]
    assert all(i.attribute != "x2" for i in exp.items)


def test_fedex_groupby_flags_outlier_group(spark):
    rows = []
    for g, mu in [("a", 10.0), ("b", 11.0), ("c", 9.5), ("d", 50.0)]:
        rows += [(g, mu + (i % 3) * 0.1) for i in range(30)]
    df = to_explainable(spark.createDataFrame(rows, ["g", "v"]), name="gb")
    res = df.groupby("g")["v"].mean()
    exp = res.explain()
    assert exp.items
    assert exp.items[0].attribute == "v_mean"
    assert exp.items[0].bin == "d"
    assert "standard deviations from the mean" in exp.items[0].explanation


def test_fedex_join_and_shapley_run(lineitem, orders, spark):
    o = orders.rename({"o_orderkey": "l_orderkey"})
    j = lineitem.merge(o, on="l_orderkey")
    exp = j.explain(top_k=2, consider="left")
    assert exp.kind == "fedex-join"
    sh = j.explain(explainer="shapley", top_k=2)
    share = sh.extras["side_share"]
    assert abs(share["left"] + share["right"] - 1.0) < 1e-9


def test_explanation_to_df_schema(spark, lineitem):
    out = lineitem[lineitem["l_quantity"] > 45]
    df = out.explain(top_k=2).to_df(spark)
    assert df.columns == ["attribute", "bin", "influence", "score", "side", "explanation"]


# ---------------------------------------------------------------- outlier
def test_outlier_finds_planted_predicate(spark):
    """Group 'z' is an outlier only because of rows with flag ~ 100."""
    rows = []
    rng = np.random.RandomState(42)
    for g in ["a", "b", "c", "d"]:
        rows += [(g, 10.0 + rng.rand(), float(rng.randint(0, 10))) for _ in range(200)]
    rows += [("z", 10.0 + rng.rand(), float(rng.randint(0, 10))) for _ in range(200)]
    # inflate z's mean via rows with flag around 100
    rows += [("z", 60.0, 100.0) for _ in range(50)]
    df = to_explainable(spark.createDataFrame(rows, ["g", "v", "flag"]), name="outl")
    res = df.groupby("g")["v"].mean()
    exp = res.explain(explainer="outlier", target="z", dir="high")
    assert exp.items
    top = exp.items[0]
    assert top.attribute == "flag"
    assert "100" in top.bin
    assert top.influence > 0
    assert "not as significant when excluding rows" in top.explanation


def test_outlier_requires_groupby(lineitem):
    out = lineitem[lineitem["l_quantity"] > 45]
    with pytest.raises(ValueError):
        out.explain(explainer="outlier", target="A")


def test_outlier_requires_target(lineitem):
    g = lineitem.groupby("l_returnflag")["l_quantity"].mean()
    with pytest.raises(ValueError):
        g.explain(explainer="outlier")


def test_outlier_bad_target_raises(lineitem):
    g = lineitem.groupby("l_returnflag")["l_quantity"].mean()
    with pytest.raises(ValueError):
        g.explain(explainer="outlier", target="NOPE")


def test_outlier_on_testdata_runs(orders):
    g = orders.groupby("o_orderpriority")["o_totalprice"].mean()
    exp = g.explain(explainer="outlier", target=g.df.first()[0], dir="high")
    assert exp.kind == "outlier"


def test_outlier_std_target_planted(spark):
    """Group 'z' has an inflated STD only because of rows with flag ~ 100."""
    rows = []
    rng = np.random.RandomState(7)
    for g in ["a", "b", "c", "d"]:
        rows += [(g, 10.0 + rng.rand(), float(rng.randint(0, 10))) for _ in range(200)]
    rows += [("z", 10.0 + rng.rand(), float(rng.randint(0, 10))) for _ in range(200)]
    # widen z's spread via extreme v at flag ~ 100
    rows += [("z", 300.0 * (1 if i % 2 else -1), 100.0) for i in range(50)]
    df = to_explainable(spark.createDataFrame(rows, ["g", "v", "flag"]), name="outl_std")
    res = df.groupby("g")["v"].std()
    exp = res.explain(explainer="outlier", target="z", dir="high")
    assert exp.items
    top = exp.items[0]
    assert top.attribute == "flag"
    assert "100" in top.bin
    assert top.influence > 0


def test_outlier_median_target_planted(spark):
    """Group 'z' has an inflated MEDIAN because >half its rows (flag ~ 100)
    sit at v ~ 60."""
    rows = []
    rng = np.random.RandomState(11)
    for g in ["a", "b", "c", "d"]:
        rows += [(g, 10.0 + rng.rand(), float(rng.randint(0, 10))) for _ in range(200)]
    rows += [("z", 10.0 + rng.rand(), float(rng.randint(0, 10))) for _ in range(100)]
    rows += [("z", 60.0 + rng.rand(), 100.0) for _ in range(150)]
    df = to_explainable(spark.createDataFrame(rows, ["g", "v", "flag"]), name="outl_med")
    res = df.groupby("g")["v"].median()
    exp = res.explain(explainer="outlier", target="z", dir="high")
    assert exp.items
    top = exp.items[0]
    assert top.attribute == "flag"
    assert "100" in top.bin
    assert top.influence > 0


def test_outlier_mean_null_safe(spark):
    """NULL measures must not deflate the reconstructed group means: without
    the non-null denominator, group 'a' (half nulls) would read as an
    artificial low outlier."""
    rows = []
    rng = np.random.RandomState(3)
    for g in ["a", "b", "c"]:
        for _ in range(200):
            v = None if (g == "a" and rng.rand() < 0.5) else 10.0 + rng.rand()
            rows.append((g, v, float(rng.randint(0, 10))))
    df = spark.createDataFrame(rows, schema="g string, v double, flag double")
    edf = to_explainable(df, name="outl_null")
    res = edf.groupby("g")["v"].mean()
    exp = res.explain(explainer="outlier", target="a", dir="low")
    # all three true means are ~10.5 -> target is NOT a real outlier;
    # the before-score must be small (nulls excluded from the mean)
    assert exp.extras.get("std_int_before", 0.0) < 1.5


def test_outlier_multi_key_groups(spark):
    rows = []
    rng = np.random.RandomState(5)
    for g1 in ["x", "y"]:
        for g2 in ["p", "q"]:
            rows += [(g1, g2, 10.0 + rng.rand(), float(rng.randint(0, 10))) for _ in range(150)]
    rows += [("x", "q", 80.0, 100.0) for _ in range(40)]
    df = to_explainable(spark.createDataFrame(rows, ["g1", "g2", "v", "flag"]), name="outl_mk")
    res = df.groupby(["g1", "g2"])["v"].mean()
    exp = res.explain(explainer="outlier", target=("x", "q"), dir="high")
    assert exp.items
    top = exp.items[0]
    assert top.attribute == "flag"
    assert "100" in top.bin


# ---------------------------------------------------------------- shapley on filters
def test_shapley_filter_decomposition_exact(lineitem):
    """phi_kept + phi_removed must equal v(all) (efficiency axiom), and the
    kept-side value must equal the mean over the kept rows."""
    out = lineitem[lineitem["l_quantity"] > 45]
    exp = out.explain(explainer="shapley", value="mean", attr="l_extendedprice",
                      use_sampling=False)
    assert exp.kind == "fedex-shapley-filter"
    sh = exp.extras["shapley"]
    assert abs((sh["kept"] + sh["removed"]) - sh["v_all"]) < 1e-6
    truth = lineitem.df.selectExpr(
        "avg(case when l_quantity > 45 then l_extendedprice end) as m"
    ).first()["m"]
    assert abs(sh["v_kept"] - float(truth)) < 1e-6
    assert exp.items  # per-column stories still present


def test_shapley_filter_kwargs_attr_default(lineitem):
    out = lineitem[lineitem["l_quantity"] > 45]
    exp = out.explain(explainer="shapley")  # attr defaults to filter column
    assert "l_quantity" in exp.extras["shapley"]["measure"]


# ------------------------------------------------------- kernel tables (r5)
def test_filter_kernel_table_ks_matches_numpy(spark):
    """The oracle-izable KS table agrees with a direct numpy recomputation
    of cumulative histogram deltas on a planted filter."""
    rows = [(float(i % 100), float((i * 37) % 50), i % 100 < 20) for i in range(2000)]
    df = to_explainable(
        spark.createDataFrame([(a, b) for a, b, _ in rows], ["x", "y"]), name="kern"
    )
    out = df[df["x"] < 20]
    from pd_explain_spark.explainers.fedex import filter_kernel_table

    t = filter_kernel_table(out, ["y"], n_bins=10).toPandas().sort_values("bin")
    assert list(t.columns) == ["attribute", "bin", "src_cnt", "res_cnt", "cum_delta", "ks"]
    src = t["src_cnt"].to_numpy(float)
    res = t["res_cnt"].to_numpy(float)
    delta = np.cumsum(src) / src.sum() - np.cumsum(res) / res.sum()
    assert np.allclose(t["cum_delta"].to_numpy(), np.round(delta, 6), atol=1e-6)
    assert np.allclose(t["ks"].to_numpy(), round(float(np.max(np.abs(delta))), 6), atol=1e-6)
    # the filter keeps x<20 uniformly across y — KS should be small but the
    # histogram totals must reconcile exactly
    assert src.sum() == 2000 and res.sum() == 400


def test_outlier_kernel_table_matches_explain_choice(spark):
    """The full influence table's argmax row is the bin explain() reports."""
    rows = []
    for i in range(1200):
        g = "t" if i % 3 == 0 else ("a" if i % 3 == 1 else "b")
        v = 200.0 if (g == "t" and i % 30 == 0) else 10.0 + (i % 5)
        attr = float(i % 40)
        rows.append((g, v, attr))
    df = to_explainable(spark.createDataFrame(rows, ["g", "v", "a"]), name="okern")
    gb = df.groupby("g")["v"].mean()
    from pd_explain_spark.explainers.outlier import outlier_kernel_table

    table = outlier_kernel_table(gb, target="t", dir="high", attributes=["a"]).toPandas()
    assert list(table.columns) == ["attribute", "bin", "kept_cnt", "influence"]
    best = table.sort_values(["influence", "attribute", "bin"],
                             ascending=[False, True, True]).iloc[0]
    exp = gb.explain(explainer="outlier", target="t", dir="high")
    assert exp.items
    # explain()'s winning influence equals the table's max (same algebra)
    assert abs(float(best["influence"]) - exp.items[0].influence) < 1e-5


# ------------------------------------------------------- series b_join (r5)
def test_series_b_join_prefix_contract_and_op(spark):
    """Reference R8 series flavor (core/explainable_series.py:112-163):
    series.b_join narrows to (keys, value), applies the <name>_<col>
    prefix contract, and records a BJoinOp that explain() accepts."""
    from pd_explain_spark.core.operations import BJoinOp

    left = to_explainable(
        spark.createDataFrame(
            [(1, 10.0, "x"), (2, 20.0, "y"), (3, 30.0, "z")], ["k", "v", "junk"]
        ),
        name="lhs",
    )
    right = to_explainable(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "tag"]), name="rhs"
    )
    out = left["v"].b_join(right, on="k", how="inner")
    assert isinstance(out.operation, BJoinOp)
    # series was narrowed: junk is gone; non-key columns carry the prefix
    assert sorted(out.df.columns) == ["k", "lhs_v", "rhs_tag"]
    assert out.df.count() == 2
    exp = out.explain(top_k=1)
    assert exp.kind in ("fedex-join", "fedex-shapley")


def test_series_b_join_with_series_rhs(spark):
    left = to_explainable(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], ["k", "v"]), name="l"
    )
    right = to_explainable(
        spark.createDataFrame([(1, 9.0), (3, 8.0)], ["k", "w"]), name="r"
    )
    out = left["v"].b_join(right["w"], on="k", how="left")
    assert sorted(out.df.columns) == ["k", "l_v", "r_w"]
    assert out.df.count() == 2


def test_series_b_join_requires_on(spark):
    left = to_explainable(spark.createDataFrame([(1, 1.0)], ["k", "v"]), name="l")
    with pytest.raises(ValueError, match="requires `on`"):
        left["v"].b_join(left, on=None)


def test_shapley_filter_kernel_table_efficiency(spark):
    """The 2-row kernel table: shapley values sum to v(all) (efficiency
    axiom) and match the explainer's extras."""
    rows = [(float(i % 50), float((i % 10) * 100)) for i in range(1000)]
    df = to_explainable(spark.createDataFrame(rows, ["x", "m"]), name="shk")
    out = df[df["x"] > 25]
    from pd_explain_spark.explainers.fedex import shapley_filter_kernel_table

    t = {r["player"]: r for r in shapley_filter_kernel_table(out, attr="m").collect()}
    assert set(t) == {"kept", "removed"}
    exp = out.explain(explainer="shapley", value="mean", attr="m", top_k=1)
    sh = exp.extras["shapley"]
    assert abs(t["kept"]["shapley"] - sh["kept"]) < 1e-5
    assert abs(t["removed"]["shapley"] - sh["removed"]) < 1e-5
    # efficiency: phi_kept + phi_removed == v(all)
    assert abs((t["kept"]["shapley"] + t["removed"]["shapley"]) - sh["v_all"]) < 1e-5


def test_join_kernel_table_histogram_reconciles(spark):
    """Union-path kernel: src histogram totals = |left|, res totals =
    |join result|, and KS is the max |cum_delta| per attribute."""
    left = to_explainable(
        spark.createDataFrame(
            [(i, float(i % 97)) for i in range(500)], ["k", "v"]
        ),
        name="l",
    )
    right = to_explainable(
        spark.createDataFrame([(i,) for i in range(0, 500, 3)], ["k"]), name="r"
    )
    j = left.merge(right, on="k", how="inner")
    from pd_explain_spark.explainers.fedex import join_kernel_table

    t = join_kernel_table(j, ["v"], n_bins=10).toPandas().sort_values("bin")
    assert t["src_cnt"].sum() == 500
    assert t["res_cnt"].sum() == j.df.count()
    import numpy as np

    delta = (
        np.cumsum(t["src_cnt"].to_numpy(float)) / t["src_cnt"].sum()
        - np.cumsum(t["res_cnt"].to_numpy(float)) / t["res_cnt"].sum()
    )
    assert np.allclose(t["ks"].to_numpy(), round(float(np.max(np.abs(delta))), 6), atol=1e-6)


def test_many_to_one_kernel_table_stats(spark):
    """Level-1 rule stats: coverage/separation reconcile with direct
    counting on a planted frame."""
    rows = [("a" if i % 2 == 0 else "b", "x" if i % 4 < 2 else "y") for i in range(100)]
    df = spark.createDataFrame(rows, ["attr1", "lab"])
    from pd_explain_spark.explainers.many_to_one import many_to_one_kernel_table

    t = {
        (r["bin"], r["label"]): r
        for r in many_to_one_kernel_table(df, "lab", ["attr1"]).collect()
    }
    # attr1='a' rows: i%2==0 (50 rows); of those, lab='x' iff i%4==0 (25)
    r = t[("a", "x")]
    assert r["cnt"] == 25
    assert abs(r["coverage"] - 25 / 50) < 1e-9       # |x| = 50
    assert abs(r["separation_err"] - 25 / 50) < 1e-9  # 'a' matches 50 total


def test_metainsight_kernel_table_cube(spark):
    """The grouping-sets cube equals the union of the two plain group-bys
    it shares one scan for."""
    rows = [("r%d" % (i % 2), "s%d" % (i % 3), "q%d" % ((i // 2) % 2), float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, ["a", "b", "c", "m"])
    from pd_explain_spark.explainers.metainsight import metainsight_kernel_table

    out = metainsight_kernel_table(df, [("a", "b"), ("a", "c")], "m").toPandas()
    gids = set(out["gid"])
    assert len(gids) == 2
    # pair (a,b): 2x3 scopes; pair (a,c): 2x2 scopes
    sizes = out.groupby("gid").size().sort_values().tolist()
    assert sizes == [4, 6]
    # spot-check one scope mean
    ab = out[(out["a"] == "r0") & (out["b"] == "s0") & out["c"].isna()]
    import numpy as np

    expect = np.mean([float(i) for i in range(60) if i % 2 == 0 and i % 3 == 0])
    assert abs(float(ab["value"].iloc[0]) - round(expect, 6)) < 1e-6


def test_series_explain_and_to_html_passthrough(spark):
    """Reference ExpSeries.explain/to_html delegate to the frame path
    (core/explainable_series.py:289-427)."""
    rows = [(float(i % 7 - 3), "a" if i % 7 > 2 else "b") for i in range(980)]
    df = to_explainable(spark.createDataFrame(rows, ["x", "cat"]), name="sx")
    out = df[df["x"] > 0]
    exp = out["cat"].explain(top_k=1)
    assert exp.kind == "fedex-filter"
    html = out["cat"].to_html(n=5)
    assert "<table" in html and "cat" in html


# ------------------------------------------- series-level outlier helpers (ref parity)
def test_std_int_hand_computed(spark):
    """Reference core/explainable_series.py:103-104 semantics on a
    (group, mean) result: |v_t - mean| / sample_std."""
    from pd_explain_spark import to_explainable

    df = to_explainable(
        spark.createDataFrame(
            [("a", 10.0), ("a", 10.0), ("b", 20.0), ("c", 30.0)], ["g", "v"]
        ),
        name="si",
    )
    grouped = df.groupby("g")["v"].mean()  # a:10, b:20, c:30
    s = df["v"]
    import statistics

    expected = abs(30 - 20) / statistics.stdev([10, 20, 30])
    assert s.std_int(grouped, "c") == pytest.approx(expected)
    # degenerate: all groups equal -> std 0 -> 0.0, not a crash
    flat = df.groupby("g")["v"].mean().df.selectExpr("g", "1.0 AS v")
    assert s.std_int(flat, "c") == 0.0


def test_calc_influence_std_drops_when_outlier_rows_excluded(spark):
    from pd_explain_spark import to_explainable

    rows = [("a", 10.0), ("a", 12.0), ("b", 11.0), ("b", 9.0), ("z", 10.0), ("z", 90.0)]
    df = to_explainable(spark.createDataFrame(rows, ["g", "v"]), name="ci")
    grouped = df.groupby("g")["v"].mean()
    s = df["v"]
    # excluding the inflated row collapses z's deviation -> influence > 0
    infl = s.calc_influence_std(grouped, df.df.filter("v < 80"), "g", "v", "z")
    assert infl > 0
    # excluding an irrelevant row barely moves it
    infl_noop = s.calc_influence_std(grouped, df.df, "g", "v", "z")
    assert infl_noop == pytest.approx(0.0, abs=1e-9)


def test_series_explain_outlier_routes_to_explainer(spark):
    from pd_explain_spark import to_explainable

    rows = []
    for g in ["a", "b", "c"]:
        rows += [(g, 10.0, 1.0) for _ in range(50)]
    rows += [("z", 10.0, 1.0) for _ in range(50)] + [("z", 80.0, 99.0) for _ in range(20)]
    df = to_explainable(spark.createDataFrame(rows, ["g", "v", "flag"]), name="seo")
    res = df.groupby("g")["v"].mean()
    series = res["v"] if "v" in res.df.columns else res[res.df.columns[-1]]
    exp = series.explain_outlier(target="z", dir="high")
    assert exp.items and exp.items[0].influence > 0


def test_reference_named_shims(lineitem):
    from pd_explain_spark.explainers.factory import ExplainerFactory, create_explainer
    from pd_explain_spark.functions.scoring import interestingness, score_queries

    assert score_queries({"a": 0.5, "b": 0.7}) == interestingness({"a": 0.5, "b": 0.7})
    out = lineitem[lineitem["l_quantity"] > 45]
    via_class = ExplainerFactory().create_explainer("fedex", out)
    via_fn = create_explainer("fedex", out)
    assert type(via_class) is type(via_fn)


# ------------------------------------------- shapley weighted-histogram parity
def test_shapley_weighted_histograms_match_union_flavor(spark):
    """The r12 weighted dual-histogram (result counts = side counts
    weighted by join-key multiplicity, null extension in the opposite
    side's NULL bin) must reproduce the rebuilt-join union flavor
    bit-for-bit on every join type, including NULL keys, NULL values,
    and multi-match keys."""
    from pd_explain_spark.explainers.histograms import (
        profile_columns,
        shapley_dual_histograms,
        shapley_dual_histograms_weighted,
    )

    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 11.0, "b"), (2, None, "a"), (3, 30.0, None),
         (None, 40.0, "c")] + [(5 + i, float(i), "x") for i in range(20)],
        "k bigint, lv double, lc string",
    )
    right = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (2, 210.0), (4, 400.0), (None, 500.0)]
        + [(5 + i, float(i * 10)) for i in range(10)],
        "k bigint, rv double",
    )
    lp = profile_columns(left, ["lv", "lc"])
    rp = profile_columns(right, ["rv"])
    for how in ("inner", "left", "right", "full"):
        res = left.selectExpr("k", "lv AS __L_lv", "lc AS __L_lc").join(
            right.selectExpr("k", "rv AS __R_rv"), on=["k"], how=how
        )
        old = shapley_dual_histograms(
            left, right, res, lp, rp, 20,
            left_rename={"lv": "__L_lv", "lc": "__L_lc"},
            right_rename={"rv": "__R_rv"},
        )
        new = shapley_dual_histograms_weighted(
            left, right, ["k"], how, lp, rp, 20
        )
        key = ["attribute", "bin"]
        o = old.groupby(key)[["src_cnt", "res_cnt"]].sum().sort_index()
        n = new.groupby(key)[["src_cnt", "res_cnt"]].sum().sort_index()
        assert o.equals(n.astype(o.dtypes.to_dict())), f"how={how} diverged"


def test_shapley_weighted_histograms_one_side_without_candidates(spark):
    """When a side has no candidate columns, the opposite side's null
    extension is priced by the key-count anti-join fallback."""
    from pd_explain_spark.explainers.histograms import (
        NULL_TOKEN,
        profile_columns,
        shapley_dual_histograms_weighted,
    )

    left = spark.createDataFrame(
        [(i,) for i in range(10)] + [(100,), (101,)], "k bigint"
    )
    right = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k bigint, rv double"
    )
    rp = profile_columns(right, ["rv"])
    pdf = shapley_dual_histograms_weighted(left, right, ["k"], "left", {}, rp, 20)
    null_bin = pdf[(pdf["bin"] == NULL_TOKEN)]
    # 2 unmatched retained left rows -> rv's NULL bin gains res_cnt 2
    assert int(null_bin["res_cnt"].sum()) == 2
