"""Numeric parity against the ACTUAL reference implementation (torch CPU).

Round-2 verdict item #2: every oracle test elsewhere checks against
hand-written numpy re-implementations — i.e. against our own reading of the
reference. These tests instead import the reference's torch modules from
/root/reference/src (torch 2.13 CPU), transplant weights between the torch
and flax modules, and assert forward/loss/pose equality on identical inputs:

  * TransformerCrossEncoder       (reference transformers.py:18-280)
  * InfoNCELossFull               (reference feature_loss.py:246-314)
  * compute_rigid_transform       (reference se3_torch.py:109-163)
  * sinkhorn (+ Kabsch composite) (reference se3_torch.py:166-239)
  * softmax_correlation           (reference qk_regtr_full.py:423-672)
  * KPConv op                     (reference kpconv_blocks.py:175-420)

The reference's unused GPU deps (MinkowskiEngine, pytorch3d, open3d,
nibabel) are stubbed out — none of the code under test touches them; they
are only pulled in by the package-level auto-import of src/models/__init__.
"""
import os
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from _refutil import REF
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not present')


@pytest.fixture(scope='module')
def ref():
    """Import the reference modules once, with GPU-only deps stubbed."""
    pytest.importorskip('torch')
    from _refutil import import_reference
    return import_reference()


def t2n(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# Geometry: weighted Kabsch + Sinkhorn
# ---------------------------------------------------------------------------

class TestSE3Parity:
    def test_weighted_kabsch(self, ref, rng):
        from superpoints_registration_tpu.ops import se3
        a = rng.normal(size=(2, 40, 3)).astype(np.float32)
        b = rng.normal(size=(2, 40, 3)).astype(np.float32)
        w = rng.uniform(0.01, 1.0, size=(2, 40)).astype(np.float32)
        want = t2n(ref.se3.compute_rigid_transform(
            ref.torch.from_numpy(a), ref.torch.from_numpy(b),
            ref.torch.from_numpy(w)))
        got = np.asarray(se3.compute_rigid_transform(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_unweighted_kabsch(self, ref, rng):
        from superpoints_registration_tpu.ops import se3
        a = rng.normal(size=(30, 3)).astype(np.float32)
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        b = a @ R.T + np.float32([0.3, -0.2, 0.5])
        want = t2n(ref.se3.compute_rigid_transform(
            ref.torch.from_numpy(a), ref.torch.from_numpy(b)))
        got = np.asarray(se3.compute_rigid_transform(
            jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_sinkhorn(self, ref, rng):
        from superpoints_registration_tpu.ops import se3
        la = rng.normal(size=(2, 12, 9)).astype(np.float32)
        want = t2n(ref.se3.sinkhorn(ref.torch.from_numpy(la), n_iters=4,
                                    slack=True))
        got = np.asarray(se3.sinkhorn_log(jnp.asarray(la), n_iters=4,
                                          slack=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_sinkhorn_slack_false_expected_deviation(self, ref, rng):
        """EXPECTED DIFFERENCE: the reference's sinkhorn takes a `slack`
        argument but never reads it (se3_torch.py:166-202 always pads the
        slack row/column). Ours honors slack=False with plain alternating
        normalization. Assert the quirk so a reference-side fix is noticed."""
        from superpoints_registration_tpu.ops import se3
        la = rng.normal(size=(1, 8, 6)).astype(np.float32)
        ref_false = t2n(ref.se3.sinkhorn(ref.torch.from_numpy(la), n_iters=4,
                                         slack=False))
        ref_true = t2n(ref.se3.sinkhorn(ref.torch.from_numpy(la), n_iters=4,
                                        slack=True))
        np.testing.assert_allclose(ref_false, ref_true)  # ref ignores slack
        ours_false = np.asarray(se3.sinkhorn_log(jnp.asarray(la), n_iters=4,
                                                 slack=False))
        assert not np.allclose(ours_false, ref_false, atol=1e-3)
        # Ours without slack truly normalizes: the final column pass makes
        # every column sum to exactly 1 (rows only approach 1 for square
        # inputs as iterations converge).
        np.testing.assert_allclose(np.exp(ours_false).sum(-2), 1.0, atol=1e-3)

    def test_sinkhorn_kabsch_composite(self, ref, rng):
        from superpoints_registration_tpu.ops import se3
        xs = rng.normal(size=(1, 20, 3)).astype(np.float32)
        xt = rng.normal(size=(1, 24, 3)).astype(np.float32)
        aff = rng.normal(size=(1, 20, 24)).astype(np.float32)
        want = t2n(ref.se3.compute_rigid_transform_with_sinkhorn(
            ref.torch.from_numpy(xs), ref.torch.from_numpy(xt),
            ref.torch.from_numpy(aff), True, 3))
        got = np.asarray(se3.compute_rigid_transform_with_sinkhorn(
            jnp.asarray(xs), jnp.asarray(xt), jnp.asarray(aff), True, 3))[0]
        np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# Cross-attention transformer: weight transplant, forward equality
# ---------------------------------------------------------------------------

def _transplant_encoder(ref, params, torch_enc, num_layers):
    """Copy torch TransformerCrossEncoder weights into the flax param tree."""
    import flax
    p = flax.core.unfreeze(params)['params']

    def dense(dst, lin):
        dst['kernel'] = jnp.asarray(t2n(lin.weight).T)
        dst['bias'] = jnp.asarray(t2n(lin.bias))

    def mha(dst, att, d):
        w = t2n(att.in_proj_weight)   # (3D, D)
        b = t2n(att.in_proj_bias)     # (3D,)
        for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
            dst[name]['kernel'] = jnp.asarray(w[i * d:(i + 1) * d].T)
            dst[name]['bias'] = jnp.asarray(b[i * d:(i + 1) * d])
        dense(dst['out_proj'], att.out_proj)

    def norm(dst, ln):
        dst['scale'] = jnp.asarray(t2n(ln.weight))
        dst['bias'] = jnp.asarray(t2n(ln.bias))

    d = torch_enc.layers[0].linear1.in_features
    for li in range(num_layers):
        tl = torch_enc.layers[li]
        fl = p[f'TransformerCrossEncoderLayer_{li}']
        mha(fl['self_attn'], tl.self_attn, d)
        mha(fl['cross_attn'], tl.multihead_attn, d)
        dense(fl['linear1'], tl.linear1)
        dense(fl['linear2'], tl.linear2)
        norm(fl['norm1'], tl.norm1)
        norm(fl['norm2'], tl.norm2)
        norm(fl['norm3'], tl.norm3)
    if torch_enc.norm is not None:
        norm(p['LayerNorm_0'], torch_enc.norm)
    return flax.core.freeze({'params': p})


class TestTransformerParity:
    @pytest.mark.parametrize('pre_norm', [True, False])
    def test_forward_equality(self, ref, rng, pre_norm):
        from superpoints_registration_tpu.models.transformer import (
            TransformerCrossEncoder)
        torch = ref.torch
        d, nhead, nl, ff = 32, 4, 2, 64
        layer = ref.tf.TransformerCrossEncoderLayer(
            d, nhead, dim_feedforward=ff, dropout=0.0, activation='relu',
            normalize_before=pre_norm, sa_val_has_pos_emb=True,
            ca_val_has_pos_emb=True)
        norm = torch.nn.LayerNorm(d) if pre_norm else None
        tenc = ref.tf.TransformerCrossEncoder(layer, nl, norm,
                                              return_intermediate=True)
        tenc.eval()
        # Random (non-default) weights so the test cannot pass vacuously.
        with torch.no_grad():
            for prm in tenc.parameters():
                prm.add_(torch.randn_like(prm) * 0.05)

        B, N, M = 2, 7, 9
        src = rng.normal(size=(B, N, d)).astype(np.float32)
        tgt = rng.normal(size=(B, M, d)).astype(np.float32)
        spos = rng.normal(size=(B, N, d)).astype(np.float32)
        tpos = rng.normal(size=(B, M, d)).astype(np.float32)

        with torch.no_grad():
            # Reference runs time-major (S, B, D).
            ws, wt = tenc(torch.from_numpy(src).transpose(0, 1),
                          torch.from_numpy(tgt).transpose(0, 1),
                          src_pos=torch.from_numpy(spos).transpose(0, 1),
                          tgt_pos=torch.from_numpy(tpos).transpose(0, 1))
        want_src = t2n(ws).transpose(0, 2, 1, 3)  # (L, B, N, D)
        want_tgt = t2n(wt).transpose(0, 2, 1, 3)

        enc = TransformerCrossEncoder(
            d_model=d, nhead=nhead, num_layers=nl, dim_feedforward=ff,
            pre_norm=pre_norm, sa_val_has_pos_emb=True,
            ca_val_has_pos_emb=True, return_intermediate=True)
        args = (jnp.asarray(src), jnp.asarray(tgt),
                jnp.ones((B, N), bool), jnp.ones((B, M), bool),
                jnp.asarray(spos), jnp.asarray(tpos))
        params = enc.init(jax.random.PRNGKey(0), *args)
        params = _transplant_encoder(ref, params, tenc, nl)
        got_src, got_tgt = enc.apply(params, *args)
        np.testing.assert_allclose(np.asarray(got_src), want_src, atol=3e-5)
        np.testing.assert_allclose(np.asarray(got_tgt), want_tgt, atol=3e-5)

    def test_padding_mask_matches_reference_semantics(self, ref, rng):
        """Reference masks pads via key_padding_mask; ours via key_valid."""
        from superpoints_registration_tpu.models.transformer import (
            TransformerCrossEncoder)
        torch = ref.torch
        d, nhead, nl = 16, 2, 1
        layer = ref.tf.TransformerCrossEncoderLayer(
            d, nhead, dim_feedforward=32, dropout=0.0,
            normalize_before=True, sa_val_has_pos_emb=False,
            ca_val_has_pos_emb=False)
        tenc = ref.tf.TransformerCrossEncoder(layer, nl, torch.nn.LayerNorm(d))
        tenc.eval()
        with torch.no_grad():
            for prm in tenc.parameters():
                prm.add_(torch.randn_like(prm) * 0.05)

        B, N, M, nv, mv = 1, 6, 5, 4, 3
        src = rng.normal(size=(B, N, d)).astype(np.float32)
        tgt = rng.normal(size=(B, M, d)).astype(np.float32)
        smask = np.zeros((B, N), bool); smask[:, :nv] = True
        tmask = np.zeros((B, M), bool); tmask[:, :mv] = True
        with torch.no_grad():
            ws, _ = tenc(torch.from_numpy(src).transpose(0, 1),
                         torch.from_numpy(tgt).transpose(0, 1),
                         src_key_padding_mask=torch.from_numpy(~smask),
                         tgt_key_padding_mask=torch.from_numpy(~tmask))
        want = t2n(ws)[0].transpose(1, 0, 2)[:, :nv]

        enc = TransformerCrossEncoder(d_model=d, nhead=nhead, num_layers=nl,
                                      dim_feedforward=32, pre_norm=True,
                                      sa_val_has_pos_emb=False,
                                      ca_val_has_pos_emb=False)
        args = (jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(smask),
                jnp.asarray(tmask))
        params = enc.init(jax.random.PRNGKey(0), *args)
        params = _transplant_encoder(ref, params, tenc, nl)
        got = np.asarray(enc.apply(params, *args)[0])[0][:, :nv]
        np.testing.assert_allclose(got, want, atol=3e-5)


# ---------------------------------------------------------------------------
# InfoNCE loss: W transplant, loss equality
# ---------------------------------------------------------------------------

class TestInfoNCEParity:
    def test_loss_equality(self, ref, rng):
        import flax
        from superpoints_registration_tpu.models.losses import InfoNCELossFull
        torch = ref.torch
        d, n, m, r_p, r_n = 16, 40, 36, 0.3, 0.6
        tl = ref.fl.InfoNCELossFull(d, r_p=r_p, r_n=r_n)
        tl.eval()

        sf = rng.normal(size=(n, d)).astype(np.float32)
        tf_ = rng.normal(size=(m, d)).astype(np.float32)
        sx = rng.uniform(0, 1.5, size=(n, 3)).astype(np.float32)
        tx = rng.uniform(0, 1.5, size=(m, 3)).astype(np.float32)
        with torch.no_grad():
            want = float(tl([torch.from_numpy(sf)], [torch.from_numpy(tf_)],
                            [torch.from_numpy(sx)], [torch.from_numpy(tx)]))

        jl = InfoNCELossFull(d_embed=d, r_p=r_p, r_n=r_n)
        args = (jnp.asarray(sf)[None], jnp.asarray(tf_)[None],
                jnp.asarray(sx)[None], jnp.asarray(tx)[None],
                jnp.ones((1, n), bool), jnp.ones((1, m), bool))
        params = jl.init(jax.random.PRNGKey(0), *args)
        p = flax.core.unfreeze(params)
        p['params']['W'] = jnp.asarray(t2n(tl.W))
        got = float(jl.apply(flax.core.freeze(p), *args))
        assert got == pytest.approx(want, abs=1e-4)


# ---------------------------------------------------------------------------
# Matching head: softmax_correlation (pose + attention parity)
# ---------------------------------------------------------------------------

def _ref_softmax_correlation(ref, cfg_dict, src_feats, tgt_feats, src_xyz,
                             tgt_xyz, src_ov, tgt_ov):
    """Thin harness around the reference's RegTR.softmax_correlation
    (qk_regtr_full.py:423-672) without instantiating the full model."""
    torch = ref.torch

    class AttrDict(dict):
        __getattr__ = dict.__getitem__

    host = types.SimpleNamespace()
    host.cfg = AttrDict(cfg_dict)
    host.dual_normalization = cfg_dict['dual_normalization']
    host.num_points_NP, host.num_points_MP = [], []
    host.softplus = torch.nn.Softplus()
    host.alpha = torch.nn.Parameter(torch.tensor(cfg_dict.get('alpha', 0.5)))
    host.beta = torch.nn.Parameter(torch.tensor(cfg_dict.get('beta', -0.5)))
    host.ratio_test = types.MethodType(ref.model.RegTR.ratio_test, host)
    fn = types.MethodType(ref.model.RegTR.softmax_correlation, host)
    with torch.no_grad():
        return fn([torch.from_numpy(f)[None] for f in src_feats],
                  [torch.from_numpy(f)[None] for f in tgt_feats],
                  [torch.from_numpy(x) for x in src_xyz],
                  [torch.from_numpy(x) for x in tgt_xyz],
                  [torch.from_numpy(o)[None, :, None] for o in src_ov],
                  [torch.from_numpy(o)[None, :, None] for o in tgt_ov])


class TestSoftmaxCorrelationParity:
    def _inputs(self, rng, n, m, d=16):
        sf = rng.normal(size=(n, d)).astype(np.float32)
        tf_ = rng.normal(size=(m, d)).astype(np.float32)
        sx = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        tx = rng.uniform(0, 1, size=(m, 3)).astype(np.float32)
        so = rng.uniform(0.2, 1, size=(1, n)).astype(np.float32)
        to = rng.uniform(0.2, 1, size=(1, m)).astype(np.float32)
        return sf, tf_, sx, tx, so, to

    def _run_both(self, ref, rng, n, m, **cfg_over):
        from superpoints_registration_tpu.models.matching import (
            MatchingConfig, softmax_correlation)
        sf, tf_, sx, tx, so, to = self._inputs(rng, n, m)
        cfg = dict(dual_normalization=True, use_ratio_test=False,
                   threshold_corr=False, use_sinkhorn=False,
                   remove_outliers_overlap=False, use_overlap_as_weights=False,
                   remove_points_from_val=False, use_lgr=False,
                   use_ransac=False, slack=True, sinkhorn_itr=3,
                   use_attn_affinity=False, use_corr_affinity=False)
        cfg.update(cfg_over)
        out = _ref_softmax_correlation(ref, cfg, [sf], [tf_], [sx], [tx],
                                       [so[0]], [to[0]])
        want_pose = t2n(out[0][0])

        mcfg = MatchingConfig(
            dual_normalization=cfg['dual_normalization'],
            use_ratio_test=cfg['use_ratio_test'],
            threshold_corr=cfg['threshold_corr'],
            remove_outliers_overlap=cfg['remove_outliers_overlap'],
            use_overlap_as_weights=cfg['use_overlap_as_weights'],
            remove_points_from_val=cfg['remove_points_from_val'],
            use_sinkhorn=cfg['use_sinkhorn'], sinkhorn_itr=cfg['sinkhorn_itr'],
            slack=cfg['slack'])

        # Ours runs on equal static budgets with validity masks (how the
        # model always calls it); the reference gets the unpadded lists —
        # equality across the two layouts is exactly the parity claim.
        s_budget = max(n, m) + 3
        def pad2(a, rows):
            out = np.zeros((s_budget,) + a.shape[1:], a.dtype)
            out[:rows] = a
            return jnp.asarray(out)[None]
        smask = jnp.asarray(np.arange(s_budget) < n)[None]
        tmask = jnp.asarray(np.arange(s_budget) < m)[None]
        got = softmax_correlation(
            pad2(sf, n), pad2(tf_, m), pad2(sx, n), pad2(tx, m),
            smask, tmask,
            jnp.asarray(np.pad(so[0], (0, s_budget - n)))[None],
            jnp.asarray(np.pad(to[0], (0, s_budget - m)))[None], mcfg,
            alpha=jnp.float32(0.5), beta=jnp.float32(-0.5))
        return want_pose, np.asarray(got['pose'])[0]

    def test_kabsch_n_gt_m(self, ref, rng):
        want, got = self._run_both(ref, rng, n=30, m=20)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_kabsch_n_le_m(self, ref, rng):
        want, got = self._run_both(ref, rng, n=18, m=26)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_overlap_reweighting(self, ref, rng):
        want, got = self._run_both(ref, rng, n=28, m=22,
                                   remove_outliers_overlap=True)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_sinkhorn_path(self, ref, rng):
        want, got = self._run_both(ref, rng, n=25, m=21, use_sinkhorn=True)
        np.testing.assert_allclose(got, want, atol=5e-5)


# ---------------------------------------------------------------------------
# KPConv op: identical kernel points + weights, packed-vs-batched equality
# ---------------------------------------------------------------------------

class TestKPConvParity:
    def test_forward_equality(self, ref, rng, monkeypatch):
        import flax
        from superpoints_registration_tpu.models import kpconv as my_kp
        torch = ref.torch
        n, k, cin, cout = 60, 12, 8, 10
        kp_extent, radius = 0.12, 0.15

        ref_op = ref.kp.KPConv(15, 3, cin, cout, kp_extent, radius,
                               fixed_kernel_points='center',
                               KP_influence='linear', aggregation_mode='sum')
        with torch.no_grad():
            ref_op.weights.normal_(std=0.2)
        ref_kp_pts = t2n(ref_op.kernel_points)

        # The reference randomizes kernel dispositions per load
        # (kernel_points.py:387-469); parity requires sharing them.
        monkeypatch.setattr(my_kp, 'load_kernel_points',
                            lambda *a, **kw: ref_kp_pts)

        pts = rng.uniform(0, 0.8, size=(n, 3)).astype(np.float32)
        x = rng.normal(size=(n, cin)).astype(np.float32)
        # Neighbor lists from the same numpy oracle both builds accept;
        # shadow index == n.
        d2 = np.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
        nb = np.full((n, k), n, np.int64)
        for i in range(n):
            cand = np.argsort(d2[i])
            cand = cand[d2[i][cand] <= radius ** 2][:k]
            nb[i, :len(cand)] = cand

        with torch.no_grad():
            want = t2n(ref_op(torch.from_numpy(pts), torch.from_numpy(pts),
                              torch.from_numpy(nb), torch.from_numpy(x)))

        op = my_kp.KPConvOp(15, cin, cout, kp_extent, radius,
                            fixed_kernel_points='center',
                            kp_influence='linear', aggregation_mode='sum')
        args = (jnp.asarray(pts)[None], jnp.asarray(pts)[None],
                jnp.asarray(nb.astype(np.int32))[None], jnp.asarray(x)[None])
        params = op.init(jax.random.PRNGKey(0), *args)
        p = flax.core.unfreeze(params)
        p['params']['weights'] = jnp.asarray(t2n(ref_op.weights))
        got = np.asarray(op.apply(flax.core.freeze(p), *args))[0]
        np.testing.assert_allclose(got, want, atol=3e-5)

    @pytest.mark.parametrize('modulated', [False, True])
    def test_deformable_forward_equality(self, ref, rng, monkeypatch,
                                         modulated):
        """Deformable (+modulated) KPConv: offsets from the transplanted
        offset_conv, deformed influences, in-range normalizer pruning
        (kpconv_blocks.py:275-356,397-414)."""
        import flax
        from superpoints_registration_tpu.models import kpconv as my_kp
        torch = ref.torch
        n, k, cin, cout = 60, 12, 8, 10
        # Small extent relative to the offsets so some neighbors fall out of
        # range of every deformed kernel point — exercising the reference's
        # pruning effect on the neighbor-count normalizer.
        kp_extent, radius = 0.06, 0.15

        torch.manual_seed(9)
        ref_op = ref.kp.KPConv(15, 3, cin, cout, kp_extent, radius,
                               fixed_kernel_points='center',
                               KP_influence='linear', aggregation_mode='sum',
                               deformable=True, modulated=modulated)
        with torch.no_grad():
            ref_op.weights.normal_(std=0.2)
            ref_op.offset_conv.weights.normal_(std=0.2)
            ref_op.offset_bias.uniform_(-0.05, 0.05)
        disp = {0: t2n(ref_op.kernel_points),
                1000: t2n(ref_op.offset_conv.kernel_points)}
        monkeypatch.setattr(my_kp, 'load_kernel_points',
                            lambda *a, **kw: disp[kw.get('seed', 0)])

        pts = rng.uniform(0, 0.8, size=(n, 3)).astype(np.float32)
        x = rng.normal(size=(n, cin)).astype(np.float32)
        d2 = np.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
        nb = np.full((n, k), n, np.int64)
        for i in range(n):
            cand = np.argsort(d2[i])
            cand = cand[d2[i][cand] <= radius ** 2][:k]
            nb[i, :len(cand)] = cand

        with torch.no_grad():
            want = t2n(ref_op(torch.from_numpy(pts), torch.from_numpy(pts),
                              torch.from_numpy(nb), torch.from_numpy(x)))

        op = my_kp.KPConvOp(15, cin, cout, kp_extent, radius,
                            fixed_kernel_points='center',
                            kp_influence='linear', aggregation_mode='sum',
                            deformable=True, modulated=modulated, kp_seed=0)
        args = (jnp.asarray(pts)[None], jnp.asarray(pts)[None],
                jnp.asarray(nb.astype(np.int32))[None], jnp.asarray(x)[None])
        params = op.init(jax.random.PRNGKey(0), *args)
        p = flax.core.unfreeze(params)
        p['params']['weights'] = jnp.asarray(t2n(ref_op.weights))
        p['params']['offset_bias'] = jnp.asarray(t2n(ref_op.offset_bias))
        p['params']['offset_conv'] = {
            'weights': jnp.asarray(t2n(ref_op.offset_conv.weights))}
        got = np.asarray(op.apply(flax.core.freeze(p), *args))[0]
        np.testing.assert_allclose(got, want, atol=3e-5)
