"""E8: query interestingness score.

Reference formula (experimental/query_recommenders/query_score_functions.py:4-19,
used by explainers/fedex_explainer.py:154-162):

 * if any per-column deviation score > 1, squash every score with
   log10(1 + x) and normalize by (1 + log10(1 + max))
 * the query score is the geometric mean of the top 4 column scores.

Driver-side math on a <= |columns| dict — no Spark job.
"""

from __future__ import annotations

import math

TOP_N = 4


def interestingness(scores: dict[str, float] | list[float], top_n: int = TOP_N) -> float:
    vals = sorted(
        (float(v) for v in (scores.values() if isinstance(scores, dict) else scores)
         if v is not None and v >= 0),
        reverse=True,
    )
    if not vals:
        return 0.0
    if vals[0] > 1:
        mx = vals[0]
        vals = [math.log10(1 + v) / (1 + math.log10(1 + mx)) for v in vals]
    top = vals[:top_n]
    if any(v == 0 for v in top):
        return 0.0
    return math.exp(sum(math.log(v) for v in top) / len(top))


def score_queries(scores: dict) -> float:
    """Reference-named alias (experimental/query_recommenders/
    query_score_functions.py:4): unified score for a measure's per-column
    score dict — identical formula to :func:`interestingness`."""
    return interestingness(scores)
