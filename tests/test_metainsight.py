"""E6 MetaInsight: pattern detection unit tests + planted-pattern mining.

The per-scope pattern detectors are pure functions — tested exactly.
Mining is tested on a planted dataset where one breakdown value
dominates the measure in every filter slice except one (the exception).
"""

import pyspark.sql.functions as F
import pytest

from pd_explain_spark import to_explainable
from pd_explain_spark.explainers.metainsight import ScopePattern, detect_pattern

SF_DIR = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- detectors
def test_detect_dominance_should_work():
    p = detect_pattern(["a", "b", "c", "d"], [100.0, 5.0, 4.0, 3.0])
    assert p.kind == "dominance" and p.highlight == "a"


def test_detect_outstanding_top_should_work():
    p = detect_pattern(list("abcdefgh"), [9.0, 5.0, 5.1, 4.9, 5.0, 5.05, 4.95, 5.0])
    assert p.kind == "outstanding-top" and p.highlight == "a"


def test_detect_trend_should_work():
    assert detect_pattern(list(range(8)), [1, 2, 3, 4, 5, 6, 7, 8]).kind == "trend-inc"
    assert detect_pattern(list(range(8)), [8, 7, 6, 5, 4, 3, 2, 1]).kind == "trend-dec"


def test_detect_unimodal_should_work():
    p = detect_pattern(list(range(7)), [1, 3, 6, 10, 6, 3, 1])
    assert p.kind == "unimodal" and p.highlight == "3"


def test_detect_none_should_work():
    assert detect_pattern(["a", "b"], [1.0, 2.0]).kind == "none"
    assert detect_pattern(list(range(6)), [5, 1, 4, 2, 5, 2]).kind == "none"


# ---------------------------------------------------------------- mining
@pytest.fixture(scope="module")
def planted(spark):
    """Measure 'val' dominated by dept='eng' in every region except one,
    where 'ops' dominates instead (a highlight-change exception)."""
    rows = []
    for region in ["r1", "r2", "r3", "r4"]:
        for dept in ["eng", "ops", "hr", "sales"]:
            base = 1000.0 if dept == ("ops" if region == "r4" else "eng") else 10.0
            for i in range(25):
                rows.append((region, dept, base + i))
    df = spark.createDataFrame(rows, ["region", "dept", "val"])
    return to_explainable(df, name="planted")


def test_planted_dominance_mined_should_work(planted):
    exp = planted.explain(
        explainer="metainsight",
        filter_dimensions=["region"],
        breakdown_dimensions=["dept"],
        measures=[("val", "mean")],
    )
    assert exp.kind == "metainsight"
    assert len(exp.items) >= 1
    top = exp.extras["insights"][0]
    assert top.pattern_kind == "dominance"
    assert top.highlight == "eng"
    # all 4 slices share the dominance KIND; r4 deviates in highlight only
    assert top.commonness == 1.0
    exc = dict((v, k) for v, k, _ in top.exceptions)
    assert exc.get("r4") == "highlight-change"
    assert "Common pattern" in exp.items[0].explanation


def test_groupby_lineage_auto_space_should_work(spark):
    from pd_explain_spark import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    g = li.groupby(["l_returnflag", "l_linestatus"])["l_extendedprice"].mean()
    exp = g.explain(explainer="metainsight")
    # search space must derive from lineage: breakdowns = group keys
    assert all(m.breakdown in ("l_returnflag", "l_linestatus") for m in exp.extras["insights"])
    assert all(m.measure == "l_extendedprice" for m in exp.extras["insights"])


def test_filter_lineage_should_work(spark):
    from pd_explain_spark import load_table

    o = load_table(spark, SF_DIR, "orders")
    out = o[o["o_totalprice"] > 150000]
    exp = out.explain(explainer="metainsight")
    assert exp.kind == "metainsight"  # smoke: runs end-to-end on real lineage


def test_sampling_partition_invariant_should_work(spark):
    """Explainer sampling must not depend on the input's partition layout
    (SURVEY §7 risk register): same data, different partitioning, same
    explanations. Guards the deterministic_sample contract."""
    from pd_explain_spark import to_explainable
    from pd_explain_spark.sources.readers import read_parquet_df

    raw = read_parquet_df(spark, f"{SF_DIR}/lineitem.parquet")
    outs = []
    for parts in (1, 7):
        li = to_explainable(raw.repartition(parts), name="lineitem")
        g = li.groupby(["l_returnflag", "l_linestatus"])["l_extendedprice"].mean()
        exp = g.explain(explainer="metainsight")
        outs.append(sorted(i.explanation for i in exp.items))
    assert outs[0] == outs[1]
    assert len(outs[0]) >= 1
