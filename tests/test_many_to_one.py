"""E5 many-to-one explainer: planted-rule recovery and API contract.

Unlike the reference's smoke-only explainer tests
(reference tests/test_explainers.py:4-6), we assert the mined rules
exactly — the planted label is a deterministic function of one column,
so the top rule per cluster must recover its generating predicate.
"""

import pyspark.sql.functions as F
import pytest

from pd_explain_spark import to_explainable

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def planted(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lab = li.withColumn(
        "qty_class",
        F.when(F.col("l_quantity") <= 20, "low")
        .when(F.col("l_quantity") <= 40, "mid")
        .otherwise("high"),
    )
    return to_explainable(lab, name="lineitem_labeled")


def test_planted_rules_recovered_should_work(planted):
    exp = planted.explain(explainer="many_to_one", labels="qty_class")
    rules = exp.extras["rules"].set_index("Cluster")
    assert set(rules.index) == {"low", "mid", "high"}
    assert rules.loc["low", "rule"].startswith("l_quantity <= ")
    assert rules.loc["high", "rule"].startswith("l_quantity > ")
    assert "and" in rules.loc["mid", "rule"]  # interval = conj of two splits
    assert (rules["separation_err"] <= 0.3).all()
    assert (rules["coverage"] >= 0.7).all()


def test_explanation_items_and_text_should_work(planted):
    exp = planted.explain(explainer="many_to_one", labels="qty_class")
    assert exp.kind == "many_to_one"
    assert len(exp.items) == 3
    txt = exp.get_explanation_in_textual_description(0)
    assert "characterized by" in txt and "coverage" in txt


def test_categorical_label_no_rules_should_work(planted):
    # independent column: no rule can reach 70% coverage / 30% separation
    exp = planted.explain(
        explainer="many_to_one", labels="l_returnflag", attributes=["l_tax", "l_discount"]
    )
    assert len(exp.extras["rules"]) == 0


def test_missing_labels_should_fail(planted):
    with pytest.raises(ValueError):
        planted.explain(explainer="many_to_one")
    with pytest.raises(KeyError):
        planted.explain(explainer="many_to_one", labels="nope")


def test_bad_mode_should_fail(planted):
    with pytest.raises(ValueError):
        planted.explain(explainer="many_to_one", labels="qty_class", mode="xor")


# -------- reference label-input parity (many_to_one_explainer.py:100-130) --
def test_positional_labels_kmeans_style(spark):
    """Row-aligned label sequence (what sklearn KMeans .labels_ gives):
    two clear blobs in v -> the rule per cluster must split on v."""
    import numpy as np

    rng = np.random.RandomState(42)
    vals = [float(x) for x in rng.rand(300) * 10] + [
        float(x) for x in rng.rand(300) * 10 + 100
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["v"]).coalesce(1)
    edf = to_explainable(df, name="blobs")
    labels = [0] * 300 + [1] * 300  # positional, like KMeans output
    exp = edf.explain(explainer="many_to_one", labels=labels, coverage_threshold=0.9)
    assert exp.items
    assert {i.attribute for i in exp.items} <= {"0", "1"}
    assert all("v" in i.bin for i in exp.items)


def test_groupby_derived_labels(planted):
    """A list of column names = group-by-derived labels (label is the tuple
    of those columns' values)."""
    exp = planted.explain(
        explainer="many_to_one", labels=["qty_class", "l_returnflag"]
    )
    assert exp.kind == "many_to_one"
    # label values are 'qty_class, l_returnflag' tuples
    if exp.items:
        assert ", " in exp.items[0].attribute


def test_label_length_mismatch_should_fail(planted):
    with pytest.raises(ValueError):
        planted.explain(explainer="many_to_one", labels=[1, 2, 3])


def test_pruning_max_dist_and_silhouette(spark):
    """> max_labels clusters: geometric pruning keeps a valid subset and
    the explainer still runs end to end."""
    import numpy as np

    rng = np.random.RandomState(0)
    rows = []
    for k in range(6):  # 6 labels, max_labels=4 forces pruning
        rows += [(float(rng.rand() + 20 * k), f"c{k}") for _ in range(80)]
    df = spark.createDataFrame(rows, ["v", "lab"])
    edf = to_explainable(df, name="many_labels")
    for method in ("max_dist", "max_silhouette"):
        exp = edf.explain(
            explainer="many_to_one", labels="lab", max_labels=4,
            label_pruning=method, coverage_threshold=0.8,
        )
        clusters = {i.attribute for i in exp.items}
        assert 0 < len(clusters) <= 4


def test_error_origin_breakdown(spark):
    """A rule with nonzero separation error reports which other groups the
    false matches come from (reference many_to_one_explainer.py:497-541)."""
    import numpy as np

    rng = np.random.RandomState(1)
    rows = [(float(rng.rand() * 10), "a") for _ in range(200)]
    rows += [(float(rng.rand() * 10 + 8), "b") for _ in range(200)]  # overlaps a
    df = spark.createDataFrame(rows, ["v", "lab"])
    edf = to_explainable(df, name="overlap")
    exp = edf.explain(
        explainer="many_to_one", labels="lab",
        coverage_threshold=0.6, separation_threshold=0.4,
    )
    rules = exp.extras["rules"]
    assert "error_explanation" in rules.columns
    with_err = rules[rules["separation_err"] > 0]
    if len(with_err):
        assert with_err["error_explanation"].str.contains("originates from group").any()
    no_err = rules[rules["separation_err"] == 0]
    if len(no_err):
        assert (no_err["error_explanation"] == "Rule has no separation error.").all()
