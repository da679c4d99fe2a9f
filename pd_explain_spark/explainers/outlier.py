"""Outlier explainer (E4) — Scorpion-style predicate search.

Semantics from the reference's in-repo kernel duplicate
(core/explainable_series.py:103-220) and the interface
(explainers/outlier_explainer.py:15-100):

  given a group-by+agg result, a target group and a direction, find the
  (attribute, bin) whose EXCLUSION most de-outliers the target:

    std_int(s, t)  = |s[t] - mean(s)| / std(s)          (s = group-agg series)
    influence(b)   = (std_int(s) - std_int(s without bin b rows))
                     * (n_kept / n_total)                (ref divides by total/kept)

  scanning 30 equi-width bins over the first 10 numeric attributes
  (core/explainable_series.py:166,174), direction-signed.

Spark design (SURVEY.md §4 custom-physical #2 — bin-removal algebra):
ONE job computes per (group, attribute, bin) partial aggregates
(count, sum) via the same explode+groupBy pattern as the histogram
service. "Exclude bin b" group means are then O(1) driver-side
combinations of the partials — the reference's 30 x attrs re-filters of
the source never happen, so the source is scanned exactly once
regardless of scale. Supports agg methods mean/sum/count/size (the
partials determine all of them exactly).

Human phrasing (llm_integrations/explanation_reasoning.py:99-104):
"the outlier is not as significant when excluding rows with property
x = y".
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from ..core.operations import GroupByOp
from ..operators.aggregates import is_numeric_type
from .base import Explanation, ExplanationItem, ExplainerBase

N_BINS = 30
MAX_ATTRS = 10
SUPPORTED_AGGS = {"mean", "sum", "count", "size"}


class OutlierExplainer(ExplainerBase):
    def __init__(
        self,
        frame,
        target=None,
        dir: str | int = "high",
        n_bins: int = N_BINS,
        max_attrs: int = MAX_ATTRS,
        **_ignored,
    ):
        op = frame.operation
        if not isinstance(op, GroupByOp):
            raise ValueError(
                "outlier explainer requires a group-by+aggregation result "
                "(reference explainers/outlier_explainer.py:33-34)"
            )
        if target is None:
            raise ValueError("outlier explainer requires `target` (a group key value)")
        if len(op.keys) != 1:
            raise ValueError("outlier explainer supports a single group attribute")
        # pick the aggregated column: single agg output expected (series flavor)
        value_cols = [c for c in op.column_mapping if op.column_mapping[c][1] != "size"]
        agg_candidates = value_cols or list(op.column_mapping)
        if not agg_candidates:
            raise ValueError("no aggregated column found in the group-by result")
        self.result_col = agg_candidates[0]
        self.g_agg, self.agg_method = op.column_mapping[self.result_col]
        if self.agg_method not in SUPPORTED_AGGS:
            raise ValueError(
                f"outlier explainer supports aggs {sorted(SUPPORTED_AGGS)}, got {self.agg_method!r}"
            )
        self.frame = frame
        self.op = op
        self.g_att = op.keys[0]
        self.target = target
        self.dir = -1 if str(dir).lower() in ("low", "-1") else 1
        self.n_bins = n_bins
        self.max_attrs = max_attrs

    # ------------------------------------------------------------------
    def _candidate_attrs(self, df) -> list[str]:
        schema = {f.name: f.dataType for f in df.schema.fields}
        attrs = [
            c for c in df.columns
            if is_numeric_type(schema[c]) and c not in (self.g_att, self.g_agg)
        ]
        return attrs[: self.max_attrs]

    def generate_explanation(self) -> Explanation:
        src = self.op.source
        attrs = self._candidate_attrs(src)
        if not attrs:
            return Explanation(kind="outlier", query=self.op.query_string())

        # profile pass: min/max per candidate attr (one agg)
        prof_exprs = []
        for a in attrs:
            prof_exprs += [
                F.min(F.col(a).cast("double")).alias(f"{a}__lo"),
                F.max(F.col(a).cast("double")).alias(f"{a}__hi"),
            ]
        prof = src.agg(*prof_exprs).first().asDict()
        ranges = {}
        for a in attrs:
            lo, hi = prof[f"{a}__lo"], prof[f"{a}__hi"]
            if lo is None or hi is None or hi <= lo:
                continue
            ranges[a] = (float(lo), float(hi))
        if not ranges:
            return Explanation(kind="outlier", query=self.op.query_string())

        # ONE pass: (group, attr, bin) -> (count, sum of agg col)
        structs = []
        for a, (lo, hi) in ranges.items():
            width = (hi - lo) / self.n_bins
            idx = F.least(
                F.lit(self.n_bins - 1),
                F.greatest(F.lit(0), F.floor((F.col(a).cast("double") - F.lit(lo)) / F.lit(width))),
            )
            bin_key = F.when(F.col(a).isNull(), F.lit(-1)).otherwise(idx).cast("int")
            structs.append(F.struct(F.lit(a).alias("attr"), bin_key.alias("bin")))
        agg_val = (
            F.col(self.g_agg).cast("double")
            if self.agg_method in ("mean", "sum")
            else F.lit(1.0)
        )
        exploded = src.select(
            F.col(self.g_att).cast("string").alias("__grp"),
            F.explode(F.array(*structs)).alias("s"),
            agg_val.alias("__v"),
        )
        partials = (
            exploded.groupBy("__grp", F.col("s.attr").alias("attr"), F.col("s.bin").alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("__v").alias("sm"))
            .toPandas()
        )
        if partials.empty:
            return Explanation(kind="outlier", query=self.op.query_string())

        return self._search(partials, ranges)

    # ------------------------------------------------------------------
    def _series_value(self, cnt: float, sm: float) -> float:
        if self.agg_method == "mean":
            return sm / cnt if cnt > 0 else math.nan
        if self.agg_method == "sum":
            return sm
        return cnt  # count / size

    def _std_int(self, values: np.ndarray, target_val: float) -> float:
        if len(values) < 2:
            return 0.0
        std = values.std(ddof=1)
        if not std or not math.isfinite(std):
            return 0.0
        return self.dir * (target_val - values.mean()) / std

    def _search(self, partials, ranges) -> Explanation:
        # per-attr totals per group reconstruct the full agg series exactly
        target_key = str(self.target)
        items: list[ExplanationItem] = []
        any_attr = next(iter(ranges))
        base = partials[partials["attr"] == any_attr].groupby("__grp")[["cnt", "sm"]].sum()
        if target_key not in base.index:
            raise ValueError(f"target group {self.target!r} not found in {self.g_att!r} groups")
        groups = list(base.index)
        base_vals = np.array([self._series_value(r.cnt, r.sm) for r in base.itertuples()])
        t_idx = groups.index(target_key)
        std_int_before = self._std_int(base_vals, base_vals[t_idx])
        n_total = float(base["cnt"].sum())

        best = None  # (influence, attr, bin_idx)
        for attr, grp in partials.groupby("attr"):
            pivot_cnt = grp.pivot_table(index="__grp", columns="bin", values="cnt", aggfunc="sum").fillna(0.0)
            pivot_sm = grp.pivot_table(index="__grp", columns="bin", values="sm", aggfunc="sum").fillna(0.0)
            tot_cnt = pivot_cnt.sum(axis=1)
            tot_sm = pivot_sm.sum(axis=1)
            for b in pivot_cnt.columns:
                if b < 0:  # null bin: reference's pd.cut drops nulls from bins
                    continue
                ex_cnt = tot_cnt - pivot_cnt[b]
                ex_sm = tot_sm - pivot_sm[b]
                kept = float(ex_cnt.sum())
                if kept <= 0:
                    continue
                mask = ex_cnt > 0
                if target_key not in ex_cnt[mask].index:
                    continue
                vals = np.array(
                    [self._series_value(c, s) for c, s in zip(ex_cnt[mask], ex_sm[mask])]
                )
                g_list = list(ex_cnt[mask].index)
                t_val = vals[g_list.index(target_key)]
                std_int_after = self._std_int(vals, t_val)
                # positive influence = exclusion reduces the outlierness,
                # scaled by kept/total (ref: inf / (n_total / n_kept))
                infl = (std_int_before - std_int_after) * (kept / n_total)
                if (
                    best is None
                    or infl > best[0]
                    or (infl == best[0] and (attr, int(b)) < (best[1], best[2]))
                ):
                    best = (infl, attr, int(b))

        if best is None:
            return Explanation(kind="outlier", query=self.op.query_string())
        infl, attr, b = best
        lo, hi = ranges[attr]
        width = (hi - lo) / self.n_bins
        b_lo, b_hi = lo + b * width, lo + (b + 1) * width
        label = f"[{b_lo:.4g}, {b_hi:.4g}{']' if b == self.n_bins - 1 else ')'}"
        # after-exclusion series for the winning predicate (chart payload)
        bgrp = partials[partials["attr"] == attr]
        p_cnt = bgrp.pivot_table(index="__grp", columns="bin", values="cnt", aggfunc="sum").fillna(0.0)
        p_sm = bgrp.pivot_table(index="__grp", columns="bin", values="sm", aggfunc="sum").fillna(0.0)
        ex_cnt = p_cnt.sum(axis=1) - (p_cnt[b] if b in p_cnt.columns else 0.0)
        ex_sm = p_sm.sum(axis=1) - (p_sm[b] if b in p_sm.columns else 0.0)
        after = {
            g: self._series_value(c, s)
            for g, c, s in zip(ex_cnt.index, ex_cnt, ex_sm)
            if c > 0
        }
        items.append(
            ExplanationItem(
                attribute=attr,
                bin=label,
                influence=float(infl),
                score=float(abs(std_int_before)),
                side=None,
                explanation=(
                    f"the outlier {self.g_att} = {self.target} is not as significant "
                    f"when excluding rows with {attr} in {label}"
                ),
                viz={
                    "kind": "dist-compare",
                    "labels": [str(g) for g in groups],
                    "src": [float(v) for v in base_vals],
                    "res": [float(after.get(g, 0.0)) for g in groups],
                    "highlight": int(t_idx),
                },
            )
        )
        exp = Explanation(kind="outlier", query=self.op.query_string(), items=items,
                          scores={attr: float(infl)})
        exp.extras["std_int_before"] = float(std_int_before)
        return exp
