"""Feature registry — the Ray-native analogue of the reference's
fabletools::register_feature hookup (/root/reference/R/zzz.R:2-25).

Contract (SURVEY.md §2.9): a feature is any
``f(x: np.ndarray, period: int = 1, **kwargs) -> dict[str, float]``.
``feature_set(tags=...)`` selects registered features by tag; the Ray
feature stage fuses the selected kernels into ONE pass per series.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FeatureSpec:
    name: str
    fn: Callable
    tags: tuple[str, ...] = field(default_factory=tuple)
    uses_period: bool = True


FEATURES: dict[str, FeatureSpec] = {}


def register_feature(name: str, tags: tuple[str, ...] = (), uses_period: bool = True):
    def deco(fn):
        FEATURES[name] = FeatureSpec(name, fn, tuple(tags), uses_period)
        return fn

    return deco


def feature_set(tags: list[str] | None = None, names: list[str] | None = None) -> list[FeatureSpec]:
    """Select features by tag (any-match) and/or explicit names."""
    out = []
    for spec in FEATURES.values():
        if names is not None and spec.name not in names:
            continue
        if tags is not None and not set(tags) & set(spec.tags):
            continue
        out.append(spec)
    return out
