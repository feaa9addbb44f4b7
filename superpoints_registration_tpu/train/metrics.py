"""Registration metrics and aggregation.

Mirrors src/models/generic_reg_model.py:294-372: per-pair rotation/translation
errors vs GT and the reg_success criterion (rot < thresh AND trans < thresh)
used for model selection.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import se3


def pose_metrics(pose_pred: jnp.ndarray, pose_gt: jnp.ndarray,
                 thresh_rot_deg: float, thresh_trans: float) -> dict:
    """Batched pose errors + success flags. Shapes: (B, 3, 4)."""
    err = se3.se3_compare(pose_pred, pose_gt)
    success = ((err['rot_deg'] < thresh_rot_deg) &
               (err['trans'] < thresh_trans)).astype(jnp.float32)
    # *_hist entries become tensorboard histograms during validation
    # (generic_reg_model.py:137-141 convention).
    return {'rot_err_deg': err['rot_deg'], 'trans_err': err['trans'],
            'reg_success': success,
            'rot_err_deg_hist': err['rot_deg'], 'trans_err_hist': err['trans']}


class StatsMeter:
    """Nan-guarded running averages keyed by metric name
    (src/utils/misc.py:40-106 equivalent)."""

    def __init__(self):
        self._sum = {}
        self._cnt = {}

    def update(self, key: str, value, n: int = 1):
        v = float(np.asarray(value).mean())
        if not np.isfinite(v):
            return
        self._sum[key] = self._sum.get(key, 0.0) + v * n
        self._cnt[key] = self._cnt.get(key, 0) + n

    def update_dict(self, d: dict, n: int = 1):
        for k, v in d.items():
            self.update(k, v, n)

    def avg(self, key: str) -> float:
        return self._sum[key] / max(self._cnt[key], 1)

    def averages(self) -> dict:
        return {k: self.avg(k) for k in self._sum}

    def clear(self):
        self._sum.clear()
        self._cnt.clear()

    def __str__(self):
        return ', '.join(f'{k}: {self.avg(k):.4g}' for k in sorted(self._sum))
