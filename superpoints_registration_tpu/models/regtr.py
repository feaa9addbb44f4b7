"""RegTR: the full registration model, single-jit and fixed-shape.

Re-design of the reference flagship (src/models/qk_regtr_full.py:30-672):
pyramid preprocessing -> KPConv encoder -> feature projection -> sine/learned
position embedding -> cross-attention transformer -> overlap head -> direct
matching head -> pose. Differences from the reference are all layout, not
semantics: clouds are (B, S, 3) mask-padded stacks, src and tgt are processed
as one (2P, S, ...) stack through the backbone (mirroring the reference's
`src_xyz + tgt_xyz` concatenation, qk_regtr_full.py:152), and the entire
forward -- preprocessing included -- jits as one XLA program.

Losses (overlap BCE + InfoNCE feature + transform L1) are computed inside the
module so the InfoNCE bilinear weight participates in the parameter tree
(qk_regtr_full.py:313-368).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import se3
from ..ops.pyramid import PyramidSpec, build_pyramid
from . import register_model
from .common import torch_linear_init
from .kpconv import KPFEncoder, encoder_plan
from .losses import InfoNCELossFull, CircleLossFull, overlap_bce, transform_loss
from .matching import MatchingConfig, softmax_correlation
from .position_embedding import PositionEmbeddingCoordsSine, PositionEmbeddingLearned
from .transformer import TransformerCrossEncoder


def propagate_overlaps(overlaps0: jnp.ndarray, meta: dict) -> list:
    """Propagate GT overlap down the pyramid by average pooling over pool
    indices (kpconv.py:552-578). overlaps0: (B, N_0) float in [0, 1]."""
    pyr = [overlaps0]
    for l, pools in enumerate(meta['pools']):
        n_l = meta['points'][l].shape[1]
        prev = pyr[l]
        valid = pools != n_l                                     # (B, N_{l+1}, K)
        # Gather with a zero row padded in for the shadow index.
        prev_pad = jnp.pad(prev, ((0, 0), (0, 1)))
        g = jnp.take_along_axis(prev_pad, pools.reshape(prev.shape[0], -1), axis=1)
        g = g.reshape(pools.shape) * valid
        cnt = jnp.maximum(jnp.sum(valid, axis=-1), 1)
        pyr.append(jnp.clip(jnp.sum(g, axis=-1) / cnt, 0.0, 1.0))
    return pyr


@register_model('regtr.RegTR')
class RegTR(nn.Module):
    """cfg: flat Config with the same keys as the reference YAMLs, plus
    `level_budgets`."""
    cfg: Any

    def setup(self):
        cfg = self.cfg
        self.spec = PyramidSpec.from_config(cfg)
        self.mcfg = MatchingConfig.from_config(cfg)

        self.kpf_encoder = KPFEncoder(config=cfg)
        _, skip_dims, _ = encoder_plan(cfg)
        self.feat_proj = nn.Dense(cfg.d_embed,
                                  kernel_init=torch_linear_init(skip_dims[-1]),
                                  bias_init=torch_linear_init(skip_dims[-1]))

        if cfg.get('pos_emb_type', 'sine') == 'sine':
            self.pos_embed = PositionEmbeddingCoordsSine(
                3, cfg.d_embed, scale=cfg.get('pos_emb_scaling', 1.0))
        else:
            self.pos_embed = PositionEmbeddingLearned(3, cfg.d_embed)

        self.transformer_encoder = TransformerCrossEncoder(
            d_model=cfg.d_embed, nhead=cfg.nhead,
            num_layers=cfg.num_encoder_layers,
            dim_feedforward=cfg.d_feedforward,
            pre_norm=cfg.pre_norm,
            sa_val_has_pos_emb=cfg.sa_val_has_pos_emb,
            ca_val_has_pos_emb=cfg.ca_val_has_pos_emb,
            activation=cfg.transformer_act,
            return_intermediate=False,
            cross_only=bool(cfg.get('transformer_cross_only', False)),
            attention_impl=cfg.get('attention_impl', 'dense'),
            grad_checkpoint=bool(cfg.get('grad_checkpoint', False)),
            compute_dtype=cfg.get('transformer_compute_dtype', 'float32'))

        self.overlap_predictor = nn.Dense(
            1, kernel_init=torch_linear_init(cfg.d_embed),
            bias_init=torch_linear_init(cfg.d_embed))

        # Sinkhorn affinity offsets (qk_regtr_full.py:77-78).
        self.alpha = self.param('alpha', nn.initializers.ones, ())
        self.beta = self.param('beta', nn.initializers.ones, ())

        if cfg.get('feature_loss_type', 'infonce') == 'infonce':
            self.feature_criterion = InfoNCELossFull(
                d_embed=cfg.d_embed, r_p=cfg.r_p, r_n=cfg.r_n)
        else:
            self.feature_criterion = CircleLossFull(r_p=cfg.r_p, r_n=cfg.r_n)

    def __call__(self, batch: dict, compute_loss: bool = True) -> dict:
        """batch keys:
            src_points/tgt_points: (P, S0, 3) padded clouds
            src_mask/tgt_mask: (P, S0) bool
            pose: (P, 3, 4) GT (needed when compute_loss)
            src_overlap/tgt_overlap: (P, S0) float GT overlap (when compute_loss)
        """
        cfg = self.cfg
        p = batch['src_points'].shape[0]

        # jax.named_scope tags show up in jax.profiler traces (--profile in
        # the CLI), replacing the reference's manual stage timers
        # (qk_regtr_full.py:150-290).
        with jax.named_scope('pyramid'):
            stacked = jnp.concatenate([batch['src_points'], batch['tgt_points']], axis=0)
            masks = jnp.concatenate([batch['src_mask'], batch['tgt_mask']], axis=0)
            meta = build_pyramid(stacked, masks, self.spec,
                                 chunk=int(cfg.get('neighbor_chunk', 1024)))

        with jax.named_scope('kpconv_backbone'):
            feats0 = jnp.ones(stacked.shape[:2] + (cfg.in_feats_dim,), jnp.float32)
            feats_un, _ = self.kpf_encoder(feats0, meta)
            both_feats = self.feat_proj(feats_un)                # (2P, Nc, D)

        pts_c = meta['points'][-1]
        mask_c = meta['masks'][-1]
        with jax.named_scope('pos_embed'):
            pe = (self.pos_embed(pts_c)
                  if cfg.transformer_encoder_has_pos_emb else None)

        src_feats, tgt_feats = both_feats[:p], both_feats[p:]
        src_kp, tgt_kp = pts_c[:p], pts_c[p:]
        src_kp_mask, tgt_kp_mask = mask_c[:p], mask_c[p:]
        src_pe = pe[:p] if pe is not None else None
        tgt_pe = pe[p:] if pe is not None else None

        with jax.named_scope('cross_encoder'):
            src_cond, tgt_cond = self.transformer_encoder(
                src_feats, tgt_feats, src_kp_mask, tgt_kp_mask, src_pe, tgt_pe)
            # (L_out, P, Nc, D); final layer for matching.
            src_final, tgt_final = src_cond[-1], tgt_cond[-1]

        with jax.named_scope('overlap_head'):
            src_overlap = jax.nn.sigmoid(self.overlap_predictor(src_final))[..., 0]
            tgt_overlap = jax.nn.sigmoid(self.overlap_predictor(tgt_final))[..., 0]

        ransac_key = (self.make_rng('ransac')
                      if self.mcfg.use_ransac and self.has_rng('ransac') else None)
        with jax.named_scope('matching'):
            match = softmax_correlation(
                src_final, tgt_final, src_kp, tgt_kp, src_kp_mask, tgt_kp_mask,
                src_overlap, tgt_overlap, self.mcfg,
                alpha=self.alpha, beta=self.beta, ransac_key=ransac_key)

        outputs = {
            'pose': match['pose'],
            'attn': match['attn'],
            'src_feat': src_cond, 'tgt_feat': tgt_cond,
            'src_kp': src_kp, 'tgt_kp': tgt_kp,
            'src_kp_mask': src_kp_mask, 'tgt_kp_mask': tgt_kp_mask,
            'src_corr': match['corr_src'], 'tgt_corr': match['corr_tgt'],
            'corr_weight': match['corr_weight'],
            'corr_valid': match['corr_valid'],
            'src_overlap': src_overlap, 'tgt_overlap': tgt_overlap,
            'pyramid_overflow': jnp.stack(
                [jnp.max(meta['n_voxels'][l] - self.spec.budgets[l])
                 for l in range(self.spec.num_levels)]),
            # Blocked-search telemetry: >0 means some query block had more
            # AABB-relevant support blocks than rmax (the farthest were
            # dropped) - raise neighbor_rmax[_pool] if it persists.
            'rel_overflow': (jnp.max(jnp.stack(meta['rel_overflow']))
                             if meta.get('rel_overflow') else jnp.int32(0)),
        }

        if compute_loss:
            with jax.named_scope('losses'):
                outputs['losses'] = self._compute_loss(outputs, batch, meta, p)
        return outputs

    def _compute_loss(self, pred: dict, batch: dict, meta: dict, p: int) -> dict:
        cfg = self.cfg
        pose_gt = batch['pose']

        # Overlap BCE against pyramid-propagated GT (qk_regtr_full.py:320-331).
        overlaps0 = jnp.concatenate(
            [batch['src_overlap'], batch['tgt_overlap']], axis=0).astype(jnp.float32)
        # The pyramid Morton-sorts level-0 points; apply the same permutation.
        overlaps0 = jnp.take_along_axis(overlaps0, meta['perm0'], axis=1)
        overlap_pyr = propagate_overlaps(overlaps0, meta)[-1]    # (2P, Nc)
        pred_overlap = jnp.concatenate([pred['src_overlap'], pred['tgt_overlap']],
                                       axis=0)
        overlap_loss = overlap_bce(
            pred_overlap, overlap_pyr, meta['masks'][-1],
            mode=cfg.get('overlap_loss_mode', 'standard'))

        # InfoNCE feature loss on layer-0 transformer output
        # (qk_regtr_full.py:340-345): anchor = GT-warped src superpoints.
        src_warped = se3.se3_transform(pose_gt, pred['src_kp'])
        feature_loss = self.feature_criterion(
            pred['src_feat'][0], pred['tgt_feat'][0],
            src_warped, pred['tgt_kp'],
            pred['src_kp_mask'], pred['tgt_kp_mask'])

        # Transform L1 on superpoints (qk_regtr_full.py:347-353).
        t_loss = transform_loss(pred['src_kp'], pred['src_kp_mask'],
                                pose_gt, pred['pose'])

        losses = {
            'overlap': overlap_loss,
            'feature': feature_loss,
            'T': t_loss,
        }
        total = (t_loss
                 + cfg.get('wt_feature', 0.1) * feature_loss
                 + cfg.get('wt_overlap', 1.0) * overlap_loss)

        if cfg.get('inlier_loss_on', False):
            resid = se3.transformation_residuals(pred['src_corr'], pred['tgt_corr'],
                                                 pred['pose'])
            m = pred['corr_valid'].astype(resid.dtype)
            per_pair = jnp.sum(resid * m, axis=-1) / jnp.maximum(jnp.sum(m, -1), 1.0)
            losses['inlier'] = jnp.sum(per_pair)
            total = total + losses['inlier']

        losses['total'] = total
        return losses
