"""Visualization smoke tests — reference style.

The reference asserts "a figure with axes exists OR an expected message
was printed" (tests/test_explainers.py:22-37). With matplotlib present
we assert a real Figure with axes; without it (this container) we assert
the printed fallback + FigureSpec with panels, exercising the same code
path a notebook user hits.
"""

from __future__ import annotations

import pytest

from pd_explain_spark.explainers.visualize import FigureSpec, clean_latex

try:
    import matplotlib  # noqa: F401

    HAVE_MPL = True
except ImportError:
    HAVE_MPL = False


def _assert_visual(result, capsys):
    if HAVE_MPL:
        assert result is not None
        assert len(result.get_axes()) > 0
    else:
        assert isinstance(result, FigureSpec)
        captured = capsys.readouterr()
        assert captured.out  # the textual rendering was printed
        assert not captured.err


def test_clean_latex_reference_regexes():
    assert clean_latex(r"$\bf{l_quantity}$ rose (in green)") == "l_quantity rose "
    assert clean_latex("a\nb\\c") == "a bc"


def test_fedex_filter_visualize(lineitem, capsys):
    out = lineitem[lineitem["l_quantity"] > 45]
    exp = out.explain(top_k=2)
    _assert_visual(exp.visualize(), capsys)
    # reference results-tuple contract: 9 fields, aligned lengths
    title, scores, k, fir, texts, bins, infl, source, show = exp.to_reference_tuple()
    assert k == len(texts) == len(bins) == len(infl) == len(scores)
    assert source == "lineitem"
    # fedex panels carry the source-vs-result histogram
    assert bins[0]["kind"] == "dist-compare"
    assert len(bins[0]["src"]) == len(bins[0]["labels"]) == len(bins[0]["res"])


def test_fedex_groupby_visualize(lineitem, capsys):
    g = lineitem.groupby("l_returnflag")["l_quantity"].mean()
    exp = g.explain()
    _assert_visual(exp.visualize(), capsys)
    assert exp.items and exp.items[0].viz["kind"] == "group-bar"
    assert len(exp.items[0].viz["labels"]) == len(exp.items[0].viz["values"])


def test_fedex_join_visualize(spark, lineitem, orders, capsys):
    o = orders.rename({"o_orderkey": "l_orderkey"})
    j = lineitem.merge(o, on="l_orderkey")
    exp = j.explain(top_k=1)
    _assert_visual(exp.visualize(), capsys)


def test_outlier_visualize(lineitem, capsys):
    g = lineitem.groupby("l_returnflag")["l_quantity"].mean()
    exp = g.explain(explainer="outlier", target="N", dir="high")
    _assert_visual(exp.visualize(), capsys)
    if exp.items:
        viz = exp.items[0].viz
        assert viz["kind"] == "dist-compare"
        assert len(viz["labels"]) == len(viz["src"])


def test_many_to_one_visualize(customer, capsys):
    exp = customer.explain(explainer="many_to_one", labels="c_mktsegment")
    _assert_visual(exp.visualize(), capsys)
    if exp.items:
        assert exp.items[0].viz["kind"] == "rule-bar"


def test_carousel_mode_degrades(lineitem, capsys):
    out = lineitem[lineitem["l_quantity"] > 45]
    exp = out.explain(top_k=1)
    result = exp.visualize(mode="carousel")
    # without ipywidgets the carousel degrades (grid figure or FigureSpec)
    if not HAVE_MPL:
        assert isinstance(result, FigureSpec)
        assert capsys.readouterr().out


def test_empty_explanation_visualize(capsys):
    from pd_explain_spark.explainers.base import Explanation

    exp = Explanation(kind="fedex-filter", query="t[...]")
    result = exp.visualize()
    if not HAVE_MPL:
        assert isinstance(result, FigureSpec)
        assert "No explanations" in capsys.readouterr().out
