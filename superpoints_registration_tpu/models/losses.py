"""Loss functions: InfoNCE / Circle feature losses, overlap BCE, transform L1.

Parity targets: src/models/losses/feature_loss.py:52-314,
src/models/losses/corr_loss.py:9-39 and the loss assembly in
src/models/qk_regtr_full.py:313-368. All losses are masked for fixed-shape
padded inputs and batched over pairs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

_NEG_INF = -1e9


def masked_cdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix (B, N, M) (valid for any rows; caller masks)."""
    sq = (jnp.sum(a * a, axis=-1)[..., :, None]
          - 2.0 * jnp.einsum('bnd,bmd->bnm', a, b)
          + jnp.sum(b * b, axis=-1)[..., None, :])
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


class InfoNCELossFull(nn.Module):
    """InfoNCE with a learned symmetric bilinear logit f_a W f_p
    (feature_loss.py:246-314).

    Positives: the nearest positive point within r_p of the (GT-warped)
    anchor. Points within r_n that are not the positive are ignored
    (excluded from the denominator).
    """
    d_embed: int
    r_p: float
    r_n: float

    @nn.compact
    def __call__(self, anchor_feat, positive_feat, anchor_xyz, positive_xyz,
                 anchor_mask, positive_mask):
        """All inputs (B, N, D) / (B, M, D) / (B, N, 3) / (B, M, 3) / (B, N) / (B, M)."""
        W = self.param('W', nn.initializers.normal(stddev=0.1),
                       (self.d_embed, self.d_embed))
        W_sym = jnp.triu(W) + jnp.triu(W).T
        logits = jnp.einsum('bic,cd,bjd->bij', anchor_feat, W_sym, positive_feat)

        dist = masked_cdist(anchor_xyz, positive_xyz)
        dist = jnp.where(positive_mask[:, None, :], dist, jnp.inf)

        idx1 = jnp.argmin(dist, axis=-1)                       # (B, N)
        dist1 = jnp.take_along_axis(dist, idx1[..., None], axis=-1)[..., 0]
        has_corr = (dist1 < self.r_p) & anchor_mask            # (B, N)

        ignore = dist < self.r_n                                # (B, N, M)
        ignore = ignore & ~jax.nn.one_hot(idx1, dist.shape[-1], dtype=bool)
        ignore = ignore | ~positive_mask[:, None, :]
        logits = jnp.where(ignore, _NEG_INF, logits)

        pos_logit = jnp.take_along_axis(logits, idx1[..., None], axis=-1)[..., 0]
        loss = -pos_logit + jax.scipy.special.logsumexp(logits, axis=-1)
        denom = jnp.maximum(jnp.sum(has_corr), 1)
        # Reference averages per-cloud then means over batch; with equal
        # budgets a global masked mean is equivalent up to per-pair counts.
        return jnp.sum(jnp.where(has_corr, loss, 0.0)) / denom


class CircleLossFull(nn.Module):
    """Dense circle loss over all point pairs (feature_loss.py:160-243)."""
    r_p: float
    r_n: float
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    log_scale: float = 10.0

    def __call__(self, anchor_feat, positive_feat, anchor_xyz, positive_xyz,
                 anchor_mask, positive_mask):
        coords_dist = masked_cdist(anchor_xyz, positive_xyz)
        feats_dist = masked_cdist(anchor_feat, positive_feat)
        valid = anchor_mask[:, :, None] & positive_mask[:, None, :]

        pos_mask = (coords_dist < self.r_p) & valid
        neg_mask = (coords_dist > self.r_n) & valid

        pos = feats_dist - 1e5 * (~pos_mask)          # -inf-ish where not pos
        pos_weight = jnp.maximum(pos - self.pos_margin, 0.0)
        lse_pos_row = jax.scipy.special.logsumexp(
            self.log_scale * (pos - self.pos_margin) * pos_weight, axis=-1)

        neg = feats_dist + 1e5 * (~neg_mask)
        neg_weight = jnp.maximum(self.neg_margin - neg, 0.0)
        lse_neg_row = jax.scipy.special.logsumexp(
            self.log_scale * (self.neg_margin - neg) * neg_weight, axis=-1)

        loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / self.log_scale
        row_valid = jnp.any(pos_mask, axis=-1)
        denom = jnp.maximum(jnp.sum(row_valid), 1)
        return jnp.sum(jnp.where(row_valid, loss_row, 0.0)) / denom


def overlap_bce(pred_prob: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                mode: str = 'standard') -> jnp.ndarray:
    """Masked binary cross-entropy for overlap prediction.

    mode='standard': proper BCE on probabilities.
    mode='reference': reproduces the reference quirk of feeding sigmoided
        probabilities into BCEWithLogits (sigmoid applied twice,
        qk_regtr_full.py:248,329).
    """
    eps = 1e-7
    if mode == 'reference':
        p = jax.nn.sigmoid(pred_prob)
    elif mode == 'standard':
        p = jnp.clip(pred_prob, eps, 1.0 - eps)
    else:
        raise ValueError(mode)
    loss = -(gt * jnp.log(jnp.clip(p, eps, 1.0)) +
             (1.0 - gt) * jnp.log(jnp.clip(1.0 - p, eps, 1.0)))
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, loss, 0.0)) / denom


def transform_loss(src_kp: jnp.ndarray, mask: jnp.ndarray, pose_gt: jnp.ndarray,
                   pose_pred: jnp.ndarray) -> jnp.ndarray:
    """Mean |T_gt x - T_pred x| over valid superpoints, SUMMED over the batch
    (matching qk_regtr_full.py:347-353, which accumulates per-pair means)."""
    from ..ops import se3
    gt_pts = se3.se3_transform(pose_gt, src_kp)
    pred_pts = se3.se3_transform(pose_pred, src_kp)
    diff = jnp.abs(gt_pts - pred_pts)                     # (B, N, 3)
    m = mask[..., None].astype(diff.dtype)
    per_pair = jnp.sum(diff * m, axis=(1, 2)) / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    return jnp.sum(per_pair)


def corr_loss(src_corr: jnp.ndarray, tgt_corr: jnp.ndarray, weight_mask: jnp.ndarray,
              pose_gt: jnp.ndarray, metric: str = 'mae') -> jnp.ndarray:
    """Correspondence loss (corr_loss.py:9-39): distance between GT-warped
    source correspondences and their matched targets. Unused by the active
    model (instantiated but never invoked, qk_regtr_full.py:100)."""
    from ..ops import se3
    warped = se3.se3_transform(pose_gt, src_corr)
    if metric == 'mae':
        d = jnp.abs(warped - tgt_corr).mean(axis=-1)
    else:
        d = jnp.square(warped - tgt_corr).mean(axis=-1)
    m = weight_mask.astype(d.dtype)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)
