"""API stability decorators (ref: agrobr/stability.py:37-131 —
@stable/@experimental/@deprecated markers on the public API).

Plain metadata + warning decorators; no Spark involvement.
"""

from __future__ import annotations

import functools
import warnings
from collections.abc import Callable


def _mark(fn: Callable, level: str) -> Callable:
    fn.__api_stability__ = level
    return fn


def stable(fn: Callable) -> Callable:
    """Covered by semver: behavior and signature are contract."""
    return _mark(fn, "stable")


def experimental(fn: Callable) -> Callable:
    """May change between minor versions; emits a one-time warning."""
    warned = []

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not warned:
            warned.append(1)
            warnings.warn(
                f"{fn.__qualname__} is experimental and may change",
                FutureWarning,
                stacklevel=2,
            )
        return fn(*args, **kwargs)

    return _mark(wrapper, "experimental")


def deprecated(reason: str) -> Callable[[Callable], Callable]:
    """Slated for removal; every call warns with the migration hint."""

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            warnings.warn(
                f"{fn.__qualname__} is deprecated: {reason}",
                DeprecationWarning,
                stacklevel=2,
            )
            return fn(*args, **kwargs)

        return _mark(wrapper, "deprecated")

    return deco


def stability_of(fn: Callable) -> str:
    return getattr(fn, "__api_stability__", "unspecified")
