"""Automated data exploration loop + query recommendation
(SURVEY.md §2.7, §3.4; reference
llm_integrations/automated_data_exploration/automated_data_exploration.py:22-882,
experimental/query_recommenders/llm_based_query_recommender.py:20-97).

Loop shape matches the reference: plan -> iterate <= N {generate queries
-> repair -> execute (safe parser, never eval) -> FEDEX+MetaInsight
analysis -> history/QueryTree} -> report with (Query x) citations.
Query *generation* is the only LLM-bound step; offline, a deterministic
generator proposes filter/groupby probes from the frame's column
profiles (seeded, so runs are reproducible) — the rest of the loop is
identical in both modes.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from ..explainers.histograms import profile_columns
from ..functions.scoring import interestingness
from ..sources.query_log import ExplorationSession, QueryLogger
from .client import Client
from .query_language import QueryParseError, execute_query, validate_query

MAX_REPAIR_ATTEMPTS = 3  # reference: failure-compensation iterations <= 3


@dataclass
class QueryRecommender:
    """Recommend k next queries; LLM-backed when a key is configured,
    deterministic profile-driven otherwise."""

    client: Client = field(default_factory=Client)
    seed: int = 42

    def recommend(self, frame, k: int = 3, history: list[str] | None = None) -> list[str]:
        history = history or []
        if self.client.available:
            resp = self.client.chat(
                "Propose dataframe queries in the mini-language "
                "[df['col'] CMP value] / .groupby('col')['col'].agg. "
                "One query per line, nothing else.",
                f"Columns: {frame.columns}\nAlready run: {history}\nPropose {k}.",
            )
            if resp:
                cands = [q.strip() for q in resp.splitlines() if q.strip()]
                good = []
                for q in cands:
                    try:
                        good.append(validate_query(q))
                    except QueryParseError:
                        continue
                if good:
                    return good[:k]
        return self._heuristic(frame, k, history)

    def _heuristic(self, frame, k: int, history: list[str]) -> list[str]:
        rnd = random.Random(self.seed + len(history))
        profiles = profile_columns(frame.df, frame.columns)
        # any numeric-dtype column with a real range is filterable — the
        # is_numeric flag (distinct > 6) would starve small DERIVED frames
        # (e.g. a 3-group aggregate) of proposals entirely
        numeric = [
            c for c, p in profiles.items()
            if p.vmin is not None and p.vmax is not None and p.vmax > p.vmin
        ]
        cats = [c for c, p in profiles.items() if not p.is_numeric and p.distinct <= 30]
        out: list[str] = []
        tries = 0
        while len(out) < k and tries < k * 10:
            tries += 1
            kind = rnd.choice(["filter", "group", "filter_group"]) if numeric and cats else (
                "filter" if numeric else "group"
            )
            q = None
            if kind in ("filter", "filter_group") and numeric:
                c = rnd.choice(numeric)
                p = profiles[c]
                cut = p.vmin + (p.vmax - p.vmin) * rnd.choice([0.25, 0.5, 0.75])
                q = f"[df['{c}'] {rnd.choice(['>', '<='])} {round(cut, 4)}]"
            if kind in ("group", "filter_group") and cats and numeric:
                g = rnd.choice(cats)
                m = rnd.choice(numeric)
                fn = rnd.choice(["mean", "sum", "count", "max"])
                q = (q or "") + f".groupby('{g}')['{m}'].{fn}()"
            if q and q not in history and q not in out:
                out.append(q)
        return out


@dataclass
class AutomatedDataExploration:
    """plan -> iterate -> analyze -> report (reference
    automated_data_exploration.py:22-882, surfaced on the frame as
    ``frame.automated_data_exploration()``,
    core/explainable_data_frame.py:137-209)."""

    frame: object = None
    client: Client = field(default_factory=Client)
    logger: QueryLogger = field(default_factory=QueryLogger)

    def run(
        self,
        user_query: str = "",
        num_iterations: int = 3,
        queries_per_iteration: int = 3,
        top_k: int = 2,
        follow_up: bool = True,
    ) -> ExplorationSession:
        """Iterate the plan->query->analyze loop over a QueryTree.

        Every executed query's RESULT frame is kept in a node->frame
        mapping (the reference's result_history_mapping,
        automated_data_exploration.py:597-599,806) and, from iteration 2
        on, the loop also proposes a follow-up query AGAINST the most
        interesting prior result, recorded with its parent node index in
        the tree (reference data_structures.py:30-49 tree_node ancestry).
        LLM-proposed queries may target a node explicitly with the
        reference's ``idx: query`` line format; bare queries run against
        the root. ``follow_up=False`` restores the flat root-only loop.
        """
        import re

        session = ExplorationSession(root_name=getattr(self.frame, "name", "df"))
        rec = QueryRecommender(client=self.client)
        ran: list[str] = []
        results: dict[int | None, object] = {None: self.frame}
        for iteration in range(num_iterations):
            proposals: list[tuple[int | None, str]] = [
                (None, q)
                for q in rec.recommend(self.frame, k=queries_per_iteration, history=ran)
            ]
            if follow_up and iteration > 0 and session.history:
                best = max(session.history, key=lambda h: h["score"])
                parent_frame = results.get(best["id"])
                if parent_frame is not None and getattr(parent_frame, "columns", None):
                    proposals += [
                        (best["id"], q)
                        for q in rec.recommend(parent_frame, k=1, history=ran)
                    ]
            for parent, q in proposals:
                m = re.match(r"^\s*(\d+)\s*:\s*", q)
                if m:  # reference's "idx: query" targeting format
                    idx = int(m.group(1))
                    if idx in results:
                        parent, q = idx, q[m.end():]
                target = results.get(parent, self.frame)
                result, texts, score = self._execute_and_analyze(target, q, top_k)
                if result is None:
                    continue
                ran.append(q)
                node_id = session.add(q, score, texts, parent=parent)
                results[node_id] = result
                self.logger.log(session.root_name, q, score)
        session.report = self._report(user_query, session)
        return session

    def _execute_and_analyze(self, target, query: str, top_k: int):
        for _ in range(MAX_REPAIR_ATTEMPTS):
            try:
                result = execute_query(target, query)
                break
            except QueryParseError:
                return None, [], 0.0
            except Exception:
                return None, [], 0.0
        texts: list[str] = []
        score = 0.0
        try:
            exp = result.explain(top_k=top_k)
            texts = exp.texts()
            score = interestingness(exp.scores)
        except Exception:
            pass
        try:
            mi = result.explain(explainer="metainsight", top_k=2)
            texts += mi.texts()
        except Exception:
            pass
        return result, texts, score

    def _entry_line(self, session: ExplorationSession, h: dict) -> str:
        parent = session.tree.get(str(h["id"]), {}).get("parent")
        chain = f", follow-up of Query {parent}" if parent is not None else ""
        return (
            f"(Query {h['id']}{chain}) {h['query']} [score {h['score']:.3f}]: "
            + "; ".join(h["explanations"][:2])
        )

    def _report(
        self, user_query: str, session: ExplorationSession, max_part_chars: int = 6000
    ) -> str:
        """Final report with (Query x) citations; derived nodes cite their
        parent so the reader can follow the tree. When the history exceeds
        the context budget, it is split into parts and summarized
        incrementally, threading the existing summary through each part —
        the reference's overflow fallback (automated_data_exploration.py
        report loop: total_parts doubling + existing_summary)."""
        lines = [f"Exploration report for {session.root_name!r}"]
        if user_query:
            lines.append(f"Goal: {user_query}")
        if self.client.available:
            entries = [self._entry_line(session, h) for h in session.history]
            parts: list[list[str]] = [[]]
            size = 0
            for e in entries:
                if size + len(e) > max_part_chars and parts[-1]:
                    parts.append([])
                    size = 0
                parts[-1].append(e)
                size += len(e)
            summary = None
            for i, part in enumerate(parts):
                preamble = (
                    f"Part {i + 1}/{len(parts)}. Existing summary so far:\n{summary}\n"
                    if summary
                    else ""
                )
                resp = self.client.chat(
                    "Summarize an exploration run. Cite findings as (Query N); "
                    "keep parent citations like (Query N, follow-up of Query M).",
                    preamble + "\n".join(part),
                )
                if resp is None:
                    break
                summary = resp
            if summary:
                lines.append(summary)
                return "\n".join(lines)
        for h in sorted(session.history, key=lambda h: -h["score"]):
            parent = session.tree.get(str(h["id"]), {}).get("parent")
            chain = f", follow-up of Query {parent}" if parent is not None else ""
            lines.append(f"(Query {h['id']}{chain}) {h['query']} — score {h['score']:.3f}")
            for t in h["explanations"][:2]:
                lines.append(f"    - {t}")
        return "\n".join(lines)


class ExplorationVisualizer:
    """Tabbed rendering of an exploration session (reference
    automated_data_exploration/visualizer.py:12-445
    ``AutomatedExplorationVisualizer.visualize_data_exploration`` →
    widgets.Tab over report / queries / query tree).

    Graceful degradation like explainers/visualize.py: without
    ipywidgets the same three sections are returned as one plain-text
    block (and printed), so the API works in scripts and CI."""

    def __init__(self, session: ExplorationSession):
        self.session = session

    # -- text sections -------------------------------------------------
    def _report_text(self) -> str:
        return self.session.report or "(no report)"

    def _queries_text(self) -> str:
        lines = []
        for h in sorted(self.session.history, key=lambda h: -h["score"]):
            lines.append(f"Query {h['id']} (score {h['score']:.3f}): {h['query']}")
            for t in h["explanations"][:3]:
                lines.append(f"    - {t}")
        return "\n".join(lines) or "(no queries executed)"

    def _tree_text(self) -> str:
        lines = []
        for node_id, node in sorted(self.session.tree.items(), key=lambda kv: int(kv[0])):
            parent = node.get("parent")
            indent = "  " if parent is not None else ""
            suffix = f"  [follow-up of Query {parent}]" if parent is not None else ""
            lines.append(f"{indent}Query {node_id}: {node['query']}{suffix}")
        return "\n".join(lines) or "(empty tree)"

    def visualize_data_exploration(self):
        """Reference-named entry point: ipywidgets Tab when available,
        printed text block otherwise."""
        sections = [
            ("Summary report", self._report_text()),
            ("Queries", self._queries_text()),
            ("Query tree", self._tree_text()),
        ]
        try:
            import ipywidgets as widgets
        except ImportError:
            block = "\n\n".join(f"=== {t} ===\n{s}" for t, s in sections)
            print(block)
            return block
        tab = widgets.Tab(
            children=[widgets.HTML(f"<pre>{s}</pre>") for _, s in sections]
        )
        for i, (t, _) in enumerate(sections):
            tab.set_title(i, t)
        return tab
