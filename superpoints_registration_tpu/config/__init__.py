"""Config system: YAML with 2-level sections flattened into one namespace.

Matches the reference's convention (src/utils/misc.py:10-29 + EasyDict): keys
from all sections are merged into a single flat namespace, so configs written
for the reference (same keys) translate directly. Extra TPU-specific keys:
`level_budgets` (static per-level point budgets) and sharding options.
"""
from __future__ import annotations

import copy
import pathlib

import yaml


class Config(dict):
    """dict with attribute access (EasyDict-alike) and .get with default."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def copy(self):
        return Config(copy.deepcopy(dict(self)))


class StaticConfig:
    """Immutable, hashable attribute/dict-access config.

    flax converts plain dict module fields into FrozenDicts (losing attribute
    access); StaticConfig is an opaque object flax leaves alone, safe to use
    as a static module hyperparameter.
    """

    def __init__(self, d):
        object.__setattr__(self, '_d', dict(d))

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __getitem__(self, k):
        return self._d[k]

    def __contains__(self, k):
        return k in self._d

    def get(self, k, default=None):
        return self._d.get(k, default)

    def keys(self):
        return self._d.keys()

    def items(self):
        return self._d.items()

    def __setattr__(self, k, v):
        raise AttributeError("StaticConfig is immutable")

    def __eq__(self, other):
        return isinstance(other, StaticConfig) and self._d == other._d

    def __hash__(self):
        return hash(repr(sorted(self._d.items(), key=lambda kv: kv[0])))

    def __repr__(self):
        return f"StaticConfig({self._d!r})"

    def to_dict(self):
        return dict(self._d)


def as_static(cfg) -> StaticConfig:
    """Coerce Config/dict/StaticConfig to StaticConfig."""
    if isinstance(cfg, StaticConfig):
        return cfg
    return StaticConfig(dict(cfg))


def load_config(path) -> Config:
    """Load a YAML config, flattening one level of section headers."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    flat = {}
    for section, value in raw.items():
        if isinstance(value, dict):
            for k, v in value.items():
                if k in flat:
                    raise ValueError(f"duplicate config key '{k}' in section '{section}'")
                flat[k] = v
        else:
            flat[section] = value
    return Config(flat)


def builtin_config_path(name: str) -> pathlib.Path:
    """Path of a packaged config under config/conf/ (e.g. 'regtr_3dmatch')."""
    p = pathlib.Path(__file__).parent / 'conf' / f'{name}.yaml'
    if not p.exists():
        raise FileNotFoundError(p)
    return p


def load_builtin(name: str) -> Config:
    return load_config(builtin_config_path(name))
