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
        numeric = [c for c, p in profiles.items() if p.is_numeric and p.vmin is not None]
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
    ) -> ExplorationSession:
        session = ExplorationSession(root_name=getattr(self.frame, "name", "df"))
        rec = QueryRecommender(client=self.client)
        ran: list[str] = []
        for _ in range(num_iterations):
            proposals = rec.recommend(self.frame, k=queries_per_iteration, history=ran)
            for q in proposals:
                result, texts, score = self._execute_and_analyze(q, top_k)
                if result is None:
                    continue
                ran.append(q)
                session.add(q, score, texts)
                self.logger.log(session.root_name, q, score)
        session.report = self._report(user_query, session)
        return session

    def _execute_and_analyze(self, query: str, top_k: int):
        for _ in range(MAX_REPAIR_ATTEMPTS):
            try:
                result = execute_query(self.frame, query)
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

    def _report(self, user_query: str, session: ExplorationSession) -> str:
        lines = [f"Exploration report for {session.root_name!r}"]
        if user_query:
            lines.append(f"Goal: {user_query}")
        if self.client.available:
            resp = self.client.chat(
                "Summarize an exploration run. Cite findings as (Query N).",
                "\n".join(
                    f"(Query {h['id']}) {h['query']} [score {h['score']:.3f}]: "
                    + "; ".join(h["explanations"][:2])
                    for h in session.history
                ),
            )
            if resp:
                lines.append(resp)
                return "\n".join(lines)
        for h in sorted(session.history, key=lambda h: -h["score"]):
            lines.append(f"(Query {h['id']}) {h['query']} — score {h['score']:.3f}")
            for t in h["explanations"][:2]:
                lines.append(f"    - {t}")
        return "\n".join(lines)
