"""Component registry + declarative config instantiation.

The reference wires every component from YAML via
``sgm.util.instantiate_from_config`` (sgm/util.py:170-187), where configs name
Python classes with a ``target:`` dotted path.  We keep the same declarative
capability but resolve through an explicit registry first (stable short names,
refactor-safe), falling back to dotted-path import restricted to this package.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Mapping, Optional

_REGISTRY: Dict[str, Any] = {}

_ALLOWED_IMPORT_PREFIXES = ("v3d_tpu.",)


def register(name: Optional[str] = None) -> Callable:
    """Class/function decorator: ``@register("edm_discretization")``."""

    def deco(obj):
        key = name or obj.__name__
        if key in _REGISTRY and _REGISTRY[key] is not obj:
            raise ValueError(f"registry name collision: {key!r}")
        _REGISTRY[key] = obj
        return obj

    return deco


def resolve(target: str) -> Any:
    """Resolve a registry short name or a dotted path within v3d_tpu."""
    if target in _REGISTRY:
        return _REGISTRY[target]
    if "." in target:
        if not target.startswith(_ALLOWED_IMPORT_PREFIXES):
            raise ValueError(
                f"target {target!r} is neither a registered name nor an "
                f"import path under {_ALLOWED_IMPORT_PREFIXES}"
            )
        module, _, attr = target.rpartition(".")
        return getattr(importlib.import_module(module), attr)
    raise KeyError(f"unknown component {target!r}; known: {sorted(_REGISTRY)}")


def instantiate(cfg: Mapping[str, Any], **extra_kwargs) -> Any:
    """Build a component from ``{"target": name, "params": {...}}``.

    Nested dicts that themselves carry a ``target`` key are instantiated
    recursively, mirroring the reference's recursive OmegaConf instantiation.
    """
    if not isinstance(cfg, Mapping) or "target" not in cfg:
        raise TypeError(f"expected mapping with 'target', got {cfg!r}")
    cls = resolve(cfg["target"])
    params = dict(cfg.get("params", {}) or {})
    params.update(extra_kwargs)
    params = {k: _maybe_instantiate(v) for k, v in params.items()}
    return cls(**params)


def _maybe_instantiate(v):
    if isinstance(v, Mapping) and "target" in v:
        return instantiate(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_maybe_instantiate(x) for x in v)
    return v


def names() -> list:
    return sorted(_REGISTRY)
