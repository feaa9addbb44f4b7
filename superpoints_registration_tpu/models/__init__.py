"""Model zoo and registry.

Mirrors the reference's `get_model('file.Class')` convention
(src/models/__init__.py:11-30) without import-all side effects: models are
registered explicitly.
"""
from __future__ import annotations

_REGISTRY = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_model(name: str):
    """Look up a model class by registry name (e.g. 'regtr.RegTR')."""
    # Import model modules lazily so the registry is populated.
    from . import regtr  # noqa: F401
    if name not in _REGISTRY:
        raise ValueError(f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build_model(name: str, cfg):
    """Instantiate a model with the config coerced to a StaticConfig."""
    from ..config import as_static
    return get_model(name)(cfg=as_static(cfg))
