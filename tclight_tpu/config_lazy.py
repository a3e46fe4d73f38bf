"""Lazy/py-file config system (the cosmos third config system).

Rebuild of cosmos1/utils/lazy_config/ (detectron2-style `LazyCall`
lazy.py:71-276 and `instantiate` instantiate.py:113) and the attrs
`make_freezable` + dotted-path `override` machinery
(cosmos1/utils/config.py:41-165, config_helper.py:68-196):

- `L(callable)(**kwargs)` builds a declarative call spec (a plain dict with
  a `_target_` dotted path) that YAML/JSON can serialize;
- `instantiate(spec)` resolves `_target_` and recursively instantiates
  nested specs;
- `override(cfg, "a.b.c=value", ...)` applies dotted-path overrides;
- `freeze`/`unfreeze` toggle mutation guards on ConfigDict trees.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Mapping

from tclight_tpu.config import ConfigDict, _parse_scalar

__all__ = ["L", "LazyCall", "instantiate", "locate", "override", "freeze",
           "unfreeze"]

_TARGET = "_target_"


def locate(dotted: str) -> Any:
    """Resolve 'pkg.module.attr' to the python object."""
    parts = dotted.split(".")
    for split in range(len(parts) - 1, 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        obj = mod
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
            return obj
        except AttributeError:
            continue
    raise ImportError(f"cannot locate {dotted!r}")


class LazyCall:
    """`L(MyClass)(a=1, b=L(Other)())` -> serializable call spec."""

    def __init__(self, target: Callable | str):
        if callable(target):
            target = f"{target.__module__}.{target.__qualname__}"
        self.target = target

    def __call__(self, **kwargs: Any) -> ConfigDict:
        return ConfigDict({_TARGET: self.target, **kwargs})


L = LazyCall


def instantiate(spec: Any) -> Any:
    """Recursively build objects from call specs."""
    if isinstance(spec, Mapping):
        kwargs = {k: instantiate(v) for k, v in spec.items() if k != _TARGET}
        if _TARGET in spec:
            fn = locate(spec[_TARGET])
            return fn(**kwargs)
        return ConfigDict(kwargs)
    if isinstance(spec, (list, tuple)):
        return type(spec)(instantiate(v) for v in spec)
    return spec


def override(cfg: ConfigDict, *assignments: str) -> ConfigDict:
    """Apply 'a.b.c=value' assignments in place (config_helper.py:68-196)."""
    for a in assignments:
        if "=" not in a:
            raise ValueError(f"override must be key=value: {a!r}")
        key, val = a.split("=", 1)
        if cfg.get_path(key) is None and not _path_parent_exists(cfg, key):
            raise KeyError(f"unknown config path {key!r}")
        cfg.set_path(key, _parse_scalar(val))
    return cfg


def _path_parent_exists(cfg: ConfigDict, dotted: str) -> bool:
    parts = dotted.split(".")
    return len(parts) == 1 or cfg.get_path(".".join(parts[:-1])) is not None


_FROZEN_FLAG = "__frozen__"


class _FrozenConfigDict(ConfigDict):
    def __setitem__(self, k, v):
        raise TypeError("config is frozen; call unfreeze() first")


def freeze(cfg: ConfigDict) -> ConfigDict:
    """Make a ConfigDict tree raise on mutation (make_freezable).
    (ConfigDict.__setattr__ routes to __setitem__, so the class swap must
    bypass it via object.__setattr__.)"""
    for v in cfg.values():
        if isinstance(v, ConfigDict):
            freeze(v)
    object.__setattr__(cfg, "__class__", _FrozenConfigDict)
    return cfg


def unfreeze(cfg: ConfigDict) -> ConfigDict:
    object.__setattr__(cfg, "__class__", ConfigDict)
    for v in cfg.values():
        if isinstance(v, ConfigDict):
            unfreeze(v)
    return cfg
