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


# Reference model names -> ours, so unmodified reference YAMLs
# (model: qk_regtr_full.RegTR, src/conf/*.yaml) resolve directly. The
# qk_ce (cross-only) family maps to the same class: its difference is the
# `transformer_cross_only` config flag (models/transformer.py).
_ALIASES = {
    'qk_regtr_full.RegTR': 'regtr.RegTR',
    'qk_regtr.RegTR': 'regtr.RegTR',
    'qk_ce.RegTR': 'regtr.RegTR',
}


def get_model(name: str):
    """Look up a model class by registry name (e.g. 'regtr.RegTR')."""
    # Import model modules lazily so the registry is populated.
    from . import regtr  # noqa: F401
    name = _ALIASES.get(name, name)
    if name not in _REGISTRY:
        raise ValueError(f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build_model(name: str, cfg):
    """Instantiate a model with the config coerced to a StaticConfig."""
    from ..config import as_static
    cls = get_model(name)
    cfg = dict(cfg)
    if name == 'qk_ce.RegTR':
        # The qk_ce family IS the cross-only architecture (the reference's
        # transformer_only_ce.py); resolving the alias without forcing the
        # flag would silently build a self+cross encoder with incompatible
        # weights.
        if cfg.get('transformer_cross_only') is False:
            raise ValueError(
                "model 'qk_ce.RegTR' requires transformer_cross_only=True "
                "(it is the cross-attention-only architecture); remove the "
                "explicit False or use 'qk_regtr_full.RegTR'")
        cfg['transformer_cross_only'] = True
    return cls(cfg=as_static(cfg))
