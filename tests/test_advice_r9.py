"""Regression tests for the round-8 ADVICE findings (fixed in round 9).

1. exact_quantiles: pending ranks that diverge into different sub-bins
   must keep narrowing independently — the old shared cursor broke on
   divergence and collected the WHOLE parent bin, which can vastly
   exceed max_collect on skewed/high-cardinality data (driver OOM risk).
2. soft_dedup_weights / leakage_safe_splits: no FORCED broadcast of the
   components table (corpus-dependent size — AQE must pick the
   strategy from the actual runtime size).
3. blocklist_filter: terms are normalized exactly like the haystack in
   both modes; terms that normalize to empty fail loud.
"""

import math

import pytest

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def test_exact_quantiles_divergent_subbins_stay_bounded(spark, monkeypatch):
    """Four ranks land in ONE top-level bin (2500 rows) but diverge into
    three different sub-bins. Every driver-side collect must stay within
    max_collect=50 (plus the <= n_bins histogram rows), and the answers
    must still match the sorted-column definition exactly."""
    from pd_explain_spark.functions.sketches import exact_quantiles

    # patch the CONCRETE class: pyspark.sql.DataFrame is an abstract
    # front in Spark 4 and instances resolve collect() on the classic
    # subclass, not the base
    from pyspark.sql.classic.dataframe import DataFrame as CDataFrame

    df = spark.range(10_000).selectExpr("cast(id as double) as v")
    sizes: list[int] = []
    orig = CDataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(CDataFrame, "collect", spy)
    qs = [0.26, 0.30, 0.40, 0.49]
    out = exact_quantiles(df, "v", qs, n_bins=4, max_collect=50, max_rounds=8)
    got = {r["q"]: r["value"] for r in orig(out)}
    n = 10_000
    for q in qs:
        assert got[q] == float(max(1, math.ceil(q * n)) - 1), q
    # the old break-on-divergence path collected the full 2500-distinct
    # parent bin here; the worklist fix keeps every collect bounded
    assert sizes, "spy saw no collects"
    assert max(sizes) <= 50, f"unbounded driver collect: {max(sizes)} rows"


def _analyzed(df: DataFrame) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_components_joins_carry_no_forced_broadcast(spark):
    """soft_dedup_weights and leakage_safe_splits leave the join
    strategy to AQE — the analyzed plan must contain no broadcast hint
    (a dup-heavy crawl's components table can approach corpus size, and
    a forced broadcast there OOMs). Semantics are covered elsewhere
    (test_pipeline_ops); this pins the plan contract."""
    from pd_explain_spark.functions.dedup import soft_dedup_weights
    from pd_explain_spark.functions.mixing import leakage_safe_splits

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id bigint, text string"
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5)], "id bigint, component bigint"
    )
    w = soft_dedup_weights(docs, components=comp)
    s = leakage_safe_splits(docs, components=comp)
    for name, plan in (("weights", _analyzed(w)), ("splits", _analyzed(s))):
        assert "ResolvedHint" not in plan, f"{name}: forced join hint in plan"
    # and the results still cover every input row with unit cluster mass
    rows = {r["doc_id"]: r for r in w.collect()}
    assert len(rows) == 8
    assert abs(rows[1]["weight"] + rows[2]["weight"] - 1.0) < 1e-9
    assert rows[3]["cluster_size"] == 1 and rows[3]["weight"] == 1.0


def test_blocklist_terms_normalized_like_haystack(spark):
    from pd_explain_spark.functions.text import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "a slow query ruined the day"),
            (2, "entirely clean text"),
            (3, "SLOW\t QUERY in mixed case and tabs"),
        ],
        "doc_id bigint, text string",
    )
    # irregular internal whitespace / case / padding in the TERM must
    # still match the whitespace-collapsed haystack — in both modes
    for ww in (True, False):
        ann = {
            r["doc_id"]: r["blocklist_hits"]
            for r in blocklist_filter(
                docs, ["  Slow \t query "], mode="annotate", whole_word=ww
            ).collect()
        }
        assert ann == {1: 1, 2: 0, 3: 1}, f"whole_word={ww}"
    with pytest.raises(ValueError, match="normalize to empty"):
        blocklist_filter(docs, ["ok", "  \t "], mode="annotate")
