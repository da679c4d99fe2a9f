"""k-anonymity (functions/profiling.py) and robust MAD anomalies
(functions/drift.py): planted-frame semantics the sf-table driver
entries can't isolate — null quasi classes, exact suppression sets,
MAD=0 skip, and z-score sign/magnitude."""

import math

import pytest

from pd_explain_spark import k_anonymity_report, k_anonymize, robust_anomalies


@pytest.fixture(scope="module")
def people(spark):
    # classes: (US,eng) x3, (US,fin) x2, (DE,eng) x1, (NULL,eng) x2
    rows = [
        (1, "US", "eng"), (2, "US", "eng"), (3, "US", "eng"),
        (4, "US", "fin"), (5, "US", "fin"),
        (6, "DE", "eng"),
        (7, None, "eng"), (8, None, "eng"),
    ]
    return spark.createDataFrame(rows, "id INT, country STRING, job STRING")


def test_k_anonymity_report_classes_and_flags(people):
    got = {
        (r["country"], r["job"]): (r["class_size"], r["at_risk"])
        for r in k_anonymity_report(people, ["country", "job"], k=2).collect()
    }
    assert got == {
        ("US", "eng"): (3, False),
        ("US", "fin"): (2, False),
        ("DE", "eng"): (1, True),
        (None, "eng"): (2, False),  # NULL quasi value is a real class
    }


def test_k_anonymize_suppresses_small_classes_null_safe(people):
    kept = sorted(r["id"] for r in k_anonymize(people, ["country", "job"], k=2).collect())
    # only the DE singleton is suppressed; the NULL-country class of 2
    # survives (null-safe join keeps it)
    assert kept == [1, 2, 3, 4, 5, 7, 8]
    kept3 = sorted(r["id"] for r in k_anonymize(people, ["country", "job"], k=3).collect())
    assert kept3 == [1, 2, 3]


def test_k_anonymity_validates_args(people):
    with pytest.raises(ValueError):
        k_anonymity_report(people, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_report(people, ["country"], k=0)


def test_robust_anomalies_flags_extreme_and_keeps_threshold_stable(spark):
    # group "a": 9 values near 10, one extreme 1000. median=10, MAD=1
    a_vals = [8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0]
    # group "b": constant -> MAD=0 -> skipped entirely
    rows = [(i, "a", v) for i, v in enumerate(a_vals)]
    rows += [(100 + i, "b", 5.0) for i in range(4)] + [(199, "b", 500.0)]
    df = spark.createDataFrame(rows, "id INT, g STRING, value DOUBLE")
    out = robust_anomalies(df, "value", by=["g"], z_thresh=3.5).collect()
    assert [r["id"] for r in out] == [9]
    r = out[0]
    assert r["med"] == 10.0 and r["mad"] == 1.0
    z = 0.6745 * (1000.0 - 10.0) / 1.0
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)


def test_robust_anomalies_ignores_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.0), (3, "a", 2.0), (4, "a", 3.0)],
        "id INT, g STRING, value DOUBLE",
    )
    # nulls drop before stats: median=2, MAD=1, no |z|>3.5 -> empty
    assert robust_anomalies(df, "value", by=["g"]).count() == 0
    with pytest.raises(ValueError):
        robust_anomalies(df, "value", by=[])


def test_k_anonymize_generalize_picks_minimal_level(spark):
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.profiling import k_anonymize_generalize

    # ages: 3x 21 (safe at level 0), 22 + 23 + 24 (each a singleton at
    # level 0; 22/23/24 share decade 2 -> safe at level 1), 99 and 98
    # and 97 (each alone in its decade -> released together only at
    # level 2 among the REMAINING "US" rows), 50 in country "ZZ"
    # (alone everywhere -> suppressed)
    rows = [(1, "US", 21), (2, "US", 21), (3, "US", 21),
            (4, "US", 22), (5, "US", 23), (6, "US", 24),
            (7, "US", 99), (8, "ZZ", 50), (9, "US", 88), (10, "US", 77)]
    df = spark.createDataFrame(rows, "id INT, country STRING, age INT")
    levels = [
        {"country": F.col("country"), "age": F.col("age")},
        {"country": F.col("country"), "age": F.floor(F.col("age") / 10)},
        {"country": F.col("country")},
    ]
    out = {r["id"]: r for r in
           k_anonymize_generalize(df, levels, k=3, keep_cols=["id"]).collect()}
    assert sorted(out) == [1, 2, 3, 4, 5, 6, 7, 9, 10]   # ZZ row suppressed
    assert {out[i]["level"] for i in (1, 2, 3)} == {0}
    assert {out[i]["level"] for i in (4, 5, 6)} == {1}
    assert out[4]["age"] == "2" and out[1]["age"] == "21"
    assert {out[i]["level"] for i in (7, 9, 10)} == {2}
    assert out[7]["age"] == "*" and out[7]["country"] == "US"


def test_k_anonymize_generalize_released_classes_reach_k(spark):
    """The ADVICE r9 leak: with ages [21,21,21,25] and k=3, full-domain
    counting released the 25 row ALONE at the decade level (its class
    "borrowed" the three 21s that publish at level 0). Iterative local
    recoding must suppress it — and every released (level, quasi) class
    must contain >= k published rows."""
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.profiling import k_anonymize_generalize

    rows = [(1, 21), (2, 21), (3, 21), (4, 25)]
    df = spark.createDataFrame(rows, "id INT, age INT")
    levels = [{"age": F.col("age")}, {"age": F.floor(F.col("age") / 10)}]
    got = k_anonymize_generalize(df, levels, k=3, keep_cols=["id"]).collect()
    assert sorted(r["id"] for r in got) == [1, 2, 3]   # the 25 suppresses
    # released classes all reach k among PUBLISHED rows at their level
    from collections import Counter
    sizes = Counter((r["level"], r["age"]) for r in got)
    assert all(v >= 3 for v in sizes.values())


def test_k_anonymize_generalize_validates(spark):
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.profiling import k_anonymize_generalize

    df = spark.createDataFrame([(1, "a")], "id INT, g STRING")
    with pytest.raises(ValueError):
        k_anonymize_generalize(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymize_generalize(df, [{"g": F.col("g")}], k=0)
    with pytest.raises(ValueError):
        # level 1 introduces a quasi name level 0 doesn't have
        k_anonymize_generalize(df, [{"g": F.col("g")}, {"h": F.col("g")}], k=2)


def test_l_diversity_flags_constant_sensitive_classes(spark):
    from pd_explain_spark.functions.profiling import l_diversity_report

    rows = [
        ("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),   # big but constant
        ("B", "x"), ("B", "y"),                            # small but diverse
        ("C", None), ("C", None), ("C", "z"),              # NULLs don't count
    ]
    df = spark.createDataFrame(rows, "g STRING, s STRING")
    got = {r["g"]: (r["class_size"], r["n_sensitive"], r["at_risk"])
           for r in l_diversity_report(df, ["g"], "s", l=2).collect()}
    assert got == {"A": (4, 1, True), "B": (2, 2, False), "C": (3, 1, True)}
    with pytest.raises(ValueError):
        l_diversity_report(df, [], "s")
    with pytest.raises(ValueError):
        l_diversity_report(df, ["g"], "s", l=0)


def test_categorical_dependence_known_tables(spark):
    """Hand-checkable contingency tables: perfect dependence gives
    Cramér's V = 1 and MI = ln(2); independence gives chi² = 0, MI = 0."""
    import math

    from pd_explain_spark.functions.profiling import categorical_dependence

    # perfect: a == b, 2x2, 4 rows each diagonal cell
    perfect = spark.createDataFrame(
        [("x", "x")] * 4 + [("y", "y")] * 4, "a STRING, b STRING"
    )
    r = categorical_dependence(perfect, "a", "b").collect()[0]
    assert (r["n"], r["n_levels_a"], r["n_levels_b"], r["dof"]) == (8, 2, 2, 1)
    assert r["cramers_v_micro"] == 1_000_000
    # MI = ln 2: two diagonal cells each (1/2)*ln(2) in nano
    assert abs(r["mi_nano"] - round(math.log(2) * 1e9)) <= 2
    # independent: uniform 2x2
    indep = spark.createDataFrame(
        [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 3, "a STRING, b STRING"
    )
    r2 = categorical_dependence(indep, "a", "b").collect()[0]
    assert r2["chi2_nano"] == 0 and r2["mi_nano"] == 0
    assert r2["cramers_v_micro"] == 0
    # NULLs excluded
    withnull = perfect.union(
        spark.createDataFrame([(None, "x"), ("x", None)], "a STRING, b STRING")
    )
    r3 = categorical_dependence(withnull, "a", "b").collect()[0]
    assert r3["n"] == 8


def test_robust_anomalies_scores_null_group_keys(spark):
    """A NULL group key is a real group (review fix): rows whose
    seasonal key is NULL still get a baseline and can flag."""
    rows = [(i, None, float(v)) for i, v in enumerate([8, 9, 9, 10, 10, 10, 11, 11, 12, 1000])]
    rows += [(100 + i, "g", 5.0 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "id INT, g STRING, value DOUBLE")
    out = robust_anomalies(df, "value", by=["g"]).collect()
    assert [r["id"] for r in out] == [9]          # NULL-group outlier flags
    assert out[0]["med"] == 10.0 and out[0]["mad"] == 1.0
