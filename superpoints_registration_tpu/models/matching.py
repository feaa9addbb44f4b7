"""Direct superpoint matching head: dual-softmax correlation -> pose.

Re-design of the reference's `softmax_correlation`
(src/models/qk_regtr_full.py:423-672) without the python-loop-over-batch and
the N>M / N<=M code duplication: everything is batched over pairs with
validity masks, both matching directions are computed with static shapes and
the per-pair direction (matching *from* the larger cloud *onto* the smaller,
as the reference does) is selected with `where`.

Supports the full option set: dual-softmax normalization, Lowe ratio test,
median thresholding, overlap-based outlier downweighting / weighting, top-k
confidence filtering, Sinkhorn-weighted Procrustes or direct weighted Kabsch,
LGR refinement, and RANSAC.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import se3

_NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    """Static matching options (mirrors the reference YAML `model:` section)."""
    dual_normalization: bool = True          # qk_regtr_full.py:120
    use_ratio_test: bool = False
    lowe_thres: float = 0.9
    threshold_corr: bool = False             # median-threshold val
    remove_outliers_overlap: bool = False
    use_overlap_as_weights: bool = False
    remove_points_from_val: bool = False
    val_threshold: float = 0.15
    use_sinkhorn: bool = False
    sinkhorn_itr: int = 3
    slack: bool = True
    use_lgr: bool = False
    num_refinement_steps: int = 4
    acceptance_radius: float = 0.1
    use_ransac: bool = False
    ransac_iters: int = 500
    ransac_sample: int = 100

    @staticmethod
    def from_config(cfg) -> "MatchingConfig":
        g = lambda k, d: cfg.get(k, d) if hasattr(cfg, 'get') else getattr(cfg, k, d)
        return MatchingConfig(
            dual_normalization=bool(g('dual_normalization', True)),
            use_ratio_test=bool(g('use_ratio_test', False)),
            lowe_thres=float(g('lowe_thres', 0.9)),
            threshold_corr=bool(g('threshold_corr', False)),
            remove_outliers_overlap=bool(g('remove_outliers_overlap', False)),
            use_overlap_as_weights=bool(g('use_overlap_as_weights', False)),
            remove_points_from_val=bool(g('remove_points_from_val', False)),
            val_threshold=float(g('val_threshold', 0.15)),
            use_sinkhorn=bool(g('use_sinkhorn', False)),
            sinkhorn_itr=int(g('sinkhorn_itr', 3)),
            slack=bool(g('slack', True)),
            use_lgr=bool(g('use_lgr', False)),
            num_refinement_steps=int(g('num_refinement_steps', 4)),
            acceptance_radius=float(g('acceptance_radius', 0.1)),
            use_ransac=bool(g('use_ransac', False)),
            ransac_iters=int(g('ransac_iters', 500)),
            ransac_sample=int(g('ransac_sample', 100)),
        )


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Lower median of valid entries along the last axis. x, mask: (..., N)."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big, axis=-1)
    cnt = jnp.sum(mask.astype(jnp.int32), axis=-1)
    idx = jnp.maximum((cnt - 1) // 2, 0)
    return jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]


def _ratio_test(attn: jnp.ndarray, lowe_thres: float):
    """Lowe ratio test along the last axis (qk_regtr_full.py:370-384):
    keep the best value only when second/best < threshold."""
    val2, ind2 = jax.lax.top_k(attn, 2)
    ratio = val2[..., 1] / jnp.maximum(val2[..., 0], 1e-12)
    val = jnp.where(ratio < lowe_thres, val2[..., 0], 0.0)
    return ind2[..., 0], val


def _topk_weight_filter(val: jnp.ndarray, mask: jnp.ndarray, frac: float):
    """Keep the top ceil(frac * n_valid) weights, zero the rest.

    Equivalent to the reference's top-k gather (qk_regtr_full.py:499-502):
    zero-weight correspondences are invisible to weighted Kabsch.
    """
    v = jnp.where(mask, val, -jnp.inf)
    s = jnp.sort(v, axis=-1)[..., ::-1]  # descending
    cnt = jnp.sum(mask.astype(jnp.int32), axis=-1)
    k = jnp.clip((cnt.astype(jnp.float32) * frac).astype(jnp.int32), 1, val.shape[-1])
    kth = jnp.take_along_axis(s, (k - 1)[..., None], axis=-1)[..., 0]
    return jnp.where(val >= kth[..., None], val, 0.0)


def lgr_refine(src_pts, tgt_pts, weights, pose, acceptance_radius: float,
               num_steps: int):
    """Local-global registration: iteratively re-weight by inlier residual and
    re-solve (qk_regtr_full.py:386-398)."""
    def body(_, pose):
        resid = se3.transformation_residuals(src_pts, tgt_pts, pose)
        w = weights * (resid < acceptance_radius).astype(weights.dtype)
        return se3.compute_rigid_transform(src_pts, tgt_pts, w)
    return jax.lax.fori_loop(0, num_steps, body, pose)


def ransac(key, src_pts, tgt_pts, weights, iters: int, sample: int):
    """Fixed-iteration RANSAC, vmapped over hypotheses (qk_regtr_full.py:400-421).

    The reference samples uniformly over its dynamically-sized valid
    correspondence list; the fixed-shape equivalent here samples categorically
    over rows with weight > 0 so padded/filtered rows can never enter a
    hypothesis. If no row is valid (degenerate input) sampling falls back to
    uniform and the Kabsch degenerate guard returns identity.
    """
    valid = weights > 0
    any_valid = jnp.any(valid)
    logits = jnp.where(valid & any_valid, 0.0, _NEG_INF)
    idx = jax.random.categorical(key, logits, shape=(iters, sample))

    def hyp(ix):
        s = jnp.take(src_pts, ix, axis=-2)
        t = jnp.take(tgt_pts, ix, axis=-2)
        w = jnp.take(weights, ix, axis=-1)
        pose = se3.compute_rigid_transform(s, t, w)
        resid = se3.transformation_residuals(src_pts, tgt_pts, pose)
        denom = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(resid * valid) / denom
        # A degenerate hypothesis (collinear sample, NaN residuals) must not
        # poison argmin selection.
        return pose, jnp.where(jnp.isfinite(loss), loss, jnp.inf)

    poses, losses = jax.vmap(hyp)(idx)
    best = jnp.argmin(losses)
    return poses[best]


def softmax_correlation(src_feats: jnp.ndarray, tgt_feats: jnp.ndarray,
                        src_xyz: jnp.ndarray, tgt_xyz: jnp.ndarray,
                        src_mask: jnp.ndarray, tgt_mask: jnp.ndarray,
                        src_overlap: jnp.ndarray, tgt_overlap: jnp.ndarray,
                        mcfg: MatchingConfig,
                        alpha: jnp.ndarray | None = None,
                        beta: jnp.ndarray | None = None,
                        ransac_key=None) -> dict:
    """Batched direct matching + pose estimation.

    Args:
        src_feats/tgt_feats: (B, S, D) conditioned features (padded).
        src_xyz/tgt_xyz: (B, S, 3) superpoint coordinates.
        src_mask/tgt_mask: (B, S) validity.
        src_overlap/tgt_overlap: (B, S) predicted overlap probabilities.
        mcfg: static options.
        alpha/beta: learned affinity offsets (sinkhorn path),
            softplus(alpha) / exp(beta) as in qk_regtr_full.py:535.

    Returns dict with:
        pose: (B, 3, 4)
        attn: (B, S, S) dual-softmax correlation matrix
        corr_src/corr_tgt: (B, S, 3) matched point pairs (padded)
        corr_weight: (B, S) confidence weights (0 where padded/filtered)
        corr_valid: (B, S) bool
    """
    b, s, d = src_feats.shape
    valid2d = src_mask[:, :, None] & tgt_mask[:, None, :]

    correlation = jnp.einsum('bnd,bmd->bnm', src_feats, tgt_feats) / (d ** 0.5)

    masked_corr = jnp.where(valid2d, correlation, _NEG_INF)
    if mcfg.dual_normalization:
        attn_src = jax.nn.softmax(masked_corr, axis=-2)
        attn_tgt = jax.nn.softmax(masked_corr, axis=-1)
        attn = attn_src * attn_tgt
    else:
        # Direction-dependent single softmax; compute both, select later.
        attn = None

    n_cnt = jnp.sum(src_mask.astype(jnp.int32), axis=-1)  # (B,)
    m_cnt = jnp.sum(tgt_mask.astype(jnp.int32), axis=-1)
    src_bigger = n_cnt > m_cnt                              # (B,)

    def one_direction(a, q_mask, k_mask, q_xyz, k_xyz, q_ov, k_ov):
        """Match each query row of `a` (B, Q, K) to its best key.

        Returns (corr_q=q_xyz, corr_k=gather(k_xyz), weight, valid)."""
        if mcfg.use_ratio_test:
            ind, val = _ratio_test(a, mcfg.lowe_thres)
        else:
            val = jnp.max(a, axis=-1)
            ind = jnp.argmax(a, axis=-1)
        val = val * q_mask.astype(val.dtype)

        if mcfg.threshold_corr:
            med = masked_median(val, q_mask)
            val = jnp.where(val > med[..., None], val, 0.0)

        corr_k = jnp.take_along_axis(k_xyz, ind[..., None], axis=1)

        weight = val
        if mcfg.remove_outliers_overlap:
            k_ov_g = jnp.take_along_axis(k_ov, ind, axis=1)
            ov_prob = q_ov * k_ov_g
            if mcfg.use_overlap_as_weights:
                weight = ov_prob * q_mask.astype(val.dtype)
            else:
                weight = val * ov_prob

        if mcfg.remove_points_from_val:
            weight = _topk_weight_filter(weight, q_mask, mcfg.val_threshold)

        return q_xyz, corr_k, weight, q_mask

    if mcfg.dual_normalization:
        a_for_tgt = jnp.swapaxes(attn, -1, -2)  # (B, M, N): per-tgt over src
        a_for_src = attn                          # (B, N, M): per-src over tgt
    else:
        a_for_tgt = jnp.swapaxes(jax.nn.softmax(masked_corr, axis=-2), -1, -2)
        a_for_src = jax.nn.softmax(masked_corr, axis=-1)
        attn = a_for_src  # representative

    # Direction A (reference N>M branch): each tgt point -> best src.
    qA, kA, wA, vA = one_direction(a_for_tgt, tgt_mask, src_mask,
                                   tgt_xyz, src_xyz, tgt_overlap, src_overlap)
    # Direction B (N<=M branch): each src point -> best tgt.
    qB, kB, wB, vB = one_direction(a_for_src, src_mask, tgt_mask,
                                   src_xyz, tgt_xyz, src_overlap, tgt_overlap)

    pick = src_bigger[:, None, None]
    # Keep correspondence pairs oriented (src_pt, tgt_pt) in both cases.
    corr_src = jnp.where(pick, kA, qB)
    corr_tgt = jnp.where(pick, qA, kB)
    corr_weight = jnp.where(src_bigger[:, None], wA, wB)
    corr_valid = jnp.where(src_bigger[:, None], vA, vB)

    if mcfg.use_sinkhorn:
        # Affinity from the raw correlation (qk_regtr_full.py:532-536).
        score = jnp.clip(correlation, 0.0, None)
        sp_alpha = jax.nn.softplus(alpha) if alpha is not None else 0.0
        e_beta = jnp.exp(beta) if beta is not None else 1.0
        affinity = -(score - sp_alpha) / (e_beta + 0.02)
        pose = se3.compute_rigid_transform_with_sinkhorn(
            src_xyz, tgt_xyz, affinity, mcfg.slack, mcfg.sinkhorn_itr,
            row_mask=src_mask, col_mask=tgt_mask)
    else:
        pose = se3.compute_rigid_transform(corr_src, corr_tgt, corr_weight)

    if mcfg.use_lgr:
        pose = jax.vmap(lgr_refine, in_axes=(0, 0, 0, 0, None, None))(
            corr_src, corr_tgt, corr_weight, pose,
            mcfg.acceptance_radius, mcfg.num_refinement_steps)

    if mcfg.use_ransac:
        assert ransac_key is not None, "RANSAC needs a PRNG key"
        keys = jax.random.split(ransac_key, b)
        pose = jax.vmap(ransac, in_axes=(0, 0, 0, 0, None, None))(
            keys, corr_src, corr_tgt, corr_weight,
            mcfg.ransac_iters, mcfg.ransac_sample)

    return {
        'pose': pose,
        'attn': attn,
        'corr_src': corr_src,
        'corr_tgt': corr_tgt,
        'corr_weight': corr_weight,
        'corr_valid': corr_valid,
    }
