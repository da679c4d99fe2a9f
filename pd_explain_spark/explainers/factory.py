"""Explainer dispatch (reference explainers/explainer_factory.py:15-33).

Accepted names match the reference: 'fedex' (default), 'shapley' (a
FedexExplainer mode), 'outlier', 'many_to_one', 'metainsight'.
"""

from __future__ import annotations

from .base import ExplainerBase


def create_explainer(name: str, frame, **kwargs) -> ExplainerBase:
    key = (name or "fedex").lower().replace("-", "_").replace(" ", "_")
    if key == "fedex":
        from .fedex import FedexExplainer

        return FedexExplainer(frame, **kwargs)
    if key == "shapley":
        from .fedex import FedexExplainer

        return FedexExplainer(frame, shapley=True, **kwargs)
    if key == "outlier":
        from .outlier import OutlierExplainer

        return OutlierExplainer(frame, **kwargs)
    if key in ("many_to_one", "manytoone", "cluster"):
        from .many_to_one import ManyToOneExplainer

        return ManyToOneExplainer(frame, **kwargs)
    if key == "metainsight":
        from .metainsight import MetaInsightExplainer

        return MetaInsightExplainer(frame, **kwargs)
    raise ValueError(
        f"unknown explainer {name!r}; expected one of "
        "fedex/shapley/outlier/many_to_one/metainsight"
    )


class ExplainerFactory:
    """Class-shaped dispatch matching the reference's surface
    (explainers/explainer_factory.py:15); delegates to
    :func:`create_explainer`."""

    def create_explainer(self, explainer: str, frame, **kwargs) -> ExplainerBase:
        return create_explainer(explainer, frame, **kwargs)
