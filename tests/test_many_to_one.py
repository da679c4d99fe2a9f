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
