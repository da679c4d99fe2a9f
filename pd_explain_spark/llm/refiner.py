"""Query refinement (OmniTune-style actor-critic) + LLM query recommender.

Reference surfaces (SURVEY.md §2.7):
 * LLMQueryRecommender —
   experimental/experimental_llm_integrations/llm_query_recommender.py:12-50:
   generate k queries from (schema, history-with-scores, user requests),
   extracted from a <recs>...</recs> block, '*'-delimited.
 * QueryRefiner —
   experimental/experimental_llm_integrations/query_refiner.py:12-60:
   n actor-critic rounds over a recommendation set; each round the critic
   reviews (query, score, constraints-upheld) history and the actor
   proposes improved queries; scores are the E8 interestingness measure
   ("KS test for filters/joins, CV for group-bys, geometric mean of top-4
   column scores" — ibid:45-49).

Both degrade offline-deterministically (no API key): the recommender
falls back to the profile-driven generator, and the refiner's
actor-critic becomes a seeded local search — mutate the worst-scoring
queries (shift numeric cuts, swap agg functions, change group keys),
keep what scores better. Every candidate runs through the safe
mini-language parser (llm/query_language.py) — never eval.
"""

from __future__ import annotations

import random
import re
from dataclasses import dataclass, field
from typing import Callable

from ..explainers.histograms import profile_columns
from ..functions.scoring import interestingness
from .client import Client
from .exploration import QueryRecommender
from .query_language import QueryParseError, execute_query, validate_query

_RECS_BLOCK = re.compile(r"<recs>(.*?)</recs>", re.DOTALL)


def extract_recommendations(text: str) -> list[str]:
    """Parse the reference's <recs>* q1\\n* q2</recs> format
    (llm_query_recommender.py format instructions)."""
    m = _RECS_BLOCK.search(text or "")
    body = m.group(1) if m else (text or "")
    out = []
    for line in body.splitlines():
        line = line.strip()
        if line.startswith("*"):
            line = line[1:].strip()
        if line:
            out.append(line)
    return out


@dataclass
class LLMQueryRecommender:
    """Generate k candidate queries for a frame. LLM-backed when a key is
    configured; otherwise the deterministic profile-driven generator."""

    frame: object = None
    df_name: str = "df"
    history: list = field(default_factory=list)  # [(query, score)]
    user_requests: list = field(default_factory=list)
    k: int = 4
    client: Client = field(default_factory=Client)
    seed: int = 42

    def recommend(self) -> list[str]:
        if self.client.available:
            hist = "; ".join(f"{q} (score {s:.3f})" for q, s in self.history[-10:])
            resp = self.client.chat(
                "You are a query recommender for a dataframe. Generate "
                f"{self.k} interesting, varied queries in the constrained "
                "mini-language [df['col'] CMP value].groupby('col')['col'].agg(). "
                "Wrap the list in <recs></recs>, one query per line prefixed '*'.",
                f"DataFrame {self.df_name} columns: {self.frame.columns}. "
                f"History: {hist or 'none'}. "
                + (f"User requests (highest priority): {self.user_requests}. "
                   if self.user_requests else ""),
            )
            if resp:
                good = []
                for q in extract_recommendations(resp):
                    try:
                        good.append(validate_query(q))
                    except QueryParseError:
                        continue
                if good:
                    return good[: self.k]
        return QueryRecommender(client=self.client, seed=self.seed).recommend(
            self.frame, k=self.k, history=[q for q, _ in self.history]
        )


def default_score_function(frame) -> Callable[[str], float]:
    """E8 interestingness of a query result: run the query, explain with
    fedex (measure scores only), geometric-mean-of-top-4 transform
    (functions/scoring.py)."""

    def score(query: str) -> float:
        try:
            result = execute_query(frame, query)
            exp = result.explain(top_k=1)
            return float(interestingness(exp.scores))
        except Exception:
            return 0.0

    return score


@dataclass
class QueryRefiner:
    """n rounds of actor-critic refinement over a recommendation set
    (reference query_refiner.py:12-60).

    history is a list of dicts [{iteration, query, score, origin}];
    ``refine()`` returns queries sorted by score — top-k, or every
    distinct candidate when return_all_options (reference default).
    """

    frame: object = None
    df_name: str = "df"
    recommendations: list = field(default_factory=list)
    score_function: Callable[[str], float] | None = None
    score_function_name: str = "Statistical difference from original distribution"
    k: int = 4
    user_requests: list = field(default_factory=list)
    n: int = 3
    return_all_options: bool = True
    client: Client = field(default_factory=Client)
    seed: int = 42

    def __post_init__(self):
        if self.score_function is None:
            self.score_function = default_score_function(self.frame)
        self.history: list[dict] = []

    # -- scoring ------------------------------------------------------------
    def _score_batch(self, queries: list[str], iteration: int, origin: str) -> None:
        seen = {h["query"] for h in self.history}
        for q in queries:
            if q in seen:
                continue
            try:
                q = validate_query(q)
            except QueryParseError:
                continue
            self.history.append(
                {
                    "iteration": iteration,
                    "query": q,
                    "score": self.score_function(q),
                    "origin": origin,
                }
            )
            seen.add(q)

    # -- offline actor: seeded local mutations --------------------------------
    def _mutate(self, query: str, rnd: random.Random, profiles) -> list[str]:
        out = []
        # shift numeric cuts to a different quantile
        for m in re.finditer(r"df\['(\w+)'\]\s*(>=|<=|>|<)\s*([-\d.]+)", query):
            col, op, _val = m.group(1), m.group(2), m.group(3)
            p = profiles.get(col)
            if p is None or not p.is_numeric or p.vmin is None:
                continue
            for q_frac in (0.25, 0.5, 0.75):
                cut = round(p.vmin + (p.vmax - p.vmin) * q_frac, 4)
                out.append(query[: m.start()] + f"df['{col}'] {op} {cut}" + query[m.end():])
        # swap the agg function
        for fn in ("mean", "sum", "count", "max", "min", "median"):
            swapped = re.sub(r"\.(mean|sum|count|max|min|median)\(\)", f".{fn}()", query)
            if swapped != query:
                out.append(swapped)
        rnd.shuffle(out)
        return out[:4]

    def _offline_round(self, iteration: int) -> None:
        rnd = random.Random(self.seed + iteration)
        profiles = profile_columns(self.frame.df, self.frame.columns)
        ranked = sorted(self.history, key=lambda h: h["score"])
        worst = [h["query"] for h in ranked[: max(2, self.k // 2)]]
        best = [h["query"] for h in ranked[-2:]]
        cands: list[str] = []
        for q in worst + best:
            cands += self._mutate(q, rnd, profiles)
        # plus fresh proposals so the search never stalls
        cands += QueryRecommender(client=self.client, seed=self.seed + iteration).recommend(
            self.frame, k=2, history=[h["query"] for h in self.history]
        )
        self._score_batch(cands, iteration, origin="actor-offline")

    # -- LLM actor-critic round ------------------------------------------------
    def _llm_round(self, iteration: int) -> bool:
        hist = "\n".join(
            f"iter {h['iteration']}: {h['query']} -> {self.score_function_name} "
            f"score {h['score']:.4f}"
            for h in self.history[-20:]
        )
        critic = self.client.chat(
            "You are a critic in an actor-critic query-refinement framework. "
            "Analyze the queries and scores; explain what makes the high "
            "scorers interesting and how the low scorers could improve. "
            "Filter/join queries are scored by a KS test between input and "
            "output distributions, group-bys by the coefficient of variation "
            "of the output; final score is the geometric mean of the top-4 "
            "column scores.",
            f"DataFrame {self.df_name} columns: {self.frame.columns}.\n{hist}",
        )
        if not critic:
            return False
        actor = self.client.chat(
            "You are an actor in an actor-critic query-refinement framework. "
            "Based on the critic's analysis, generate improved queries in the "
            "mini-language [df['col'] CMP value].groupby('col')['col'].agg(). "
            f"Wrap {self.k} queries in <recs></recs>, '*' per line.",
            f"Critic analysis:\n{critic}\nHistory:\n{hist}"
            + (f"\nUser requests: {self.user_requests}" if self.user_requests else ""),
        )
        if not actor:
            return False
        self._score_batch(extract_recommendations(actor), iteration, origin="actor-llm")
        return True

    # -- main -----------------------------------------------------------------
    def refine(self) -> list[tuple[str, float]]:
        self._score_batch(list(self.recommendations), iteration=0, origin="seed")
        for i in range(1, self.n + 1):
            if not (self.client.available and self._llm_round(i)):
                self._offline_round(i)
        ranked = sorted(self.history, key=lambda h: (-h["score"], h["query"]))
        pairs = [(h["query"], h["score"]) for h in ranked]
        return pairs if self.return_all_options else pairs[: self.k]
