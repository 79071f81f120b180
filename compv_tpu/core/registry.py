"""Algorithm registry.

Replaces the reference's integer-id factory system (core/compv_core.cxx:
149-170 registering COMPV_FAST_ID, COMPV_ORB_ID, COMPV_CANNY_ID, ... to
newObj constructors) with a plain name -> callable registry.
"""
from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Dict[str, Callable]] = {}


def register(kind: str, name: str):
    """Decorator: register a factory under (kind, name).

    kinds mirror the reference's factory families: "corner_detector",
    "corner_descriptor", "edge_detector", "hough", "hog", "matcher", "ccl".
    """

    def deco(fn: Callable) -> Callable:
        _REGISTRY.setdefault(kind, {})[name] = fn
        return fn

    return deco


def create(kind: str, name: str, *args, **kwargs):
    try:
        fn = _REGISTRY[kind][name]
    except KeyError:
        avail = sorted(_REGISTRY.get(kind, {}))
        raise KeyError(f"no {kind!r} named {name!r}; available: {avail}") from None
    return fn(*args, **kwargs)


def available(kind: str):
    return sorted(_REGISTRY.get(kind, {}))
