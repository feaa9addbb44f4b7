"""Convert a reference (neu-vi/Superpoints_Registration) torch checkpoint
into this framework's parameter tree.

A user of the reference switching to this framework brings their trained
`.pth` along: this module maps the reference RegTR state_dict
(src/models/qk_regtr_full.py:30-125 — kpf_encoder, feat_proj,
transformer_encoder, overlap_predictor, alpha/beta, feature_criterion.W)
onto the flax tree of `models/regtr.py:RegTR`, transposing torch Linear
weights and splitting fused q/k/v projections. Forward equality of the
converted model is asserted module-by-module AND full-model in
tests/test_convert_reference.py.

Two artifacts are produced:
  * the flax params pytree (saved as an orbax checkpoint compatible with
    `--resume`), and
  * `kernel_points.npz` — the reference's per-layer kernel dispositions
    (kpconv_blocks.py:244-268 stores them as buffers with a random rotation
    + jitter applied at construction; converted conv weights are only
    meaningful with the dispositions they were trained with). The loader
    installs these via ops.kernel_points.set_kernel_point_overrides.

CLI:
    python -m superpoints_registration_tpu.utils.convert_reference \
        --ckpt ref_model.pth --config regtr_3dmatch --out converted_ckpt
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np


def _t2n(v) -> np.ndarray:
    """torch tensor (or array-like) -> float32 numpy."""
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _linear(sd: dict, prefix: str, bias: bool = True) -> dict:
    """torch nn.Linear -> flax Dense: weight (out, in) -> kernel (in, out)."""
    out = {'kernel': _t2n(sd[f'{prefix}.weight']).T}
    if bias:
        out['bias'] = _t2n(sd[f'{prefix}.bias'])
    return out


def _unary(sd: dict, prefix: str) -> dict:
    """Reference UnaryBlock (kpconv_blocks.py:533-567): bias-free Linear +
    InstanceNorm (param-free; use_batch_norm: false checkpoints are rejected
    up-front in convert_state_dict)."""
    return {'Dense_0': {'kernel': _t2n(sd[f'{prefix}.mlp.weight']).T}}


def _mha(sd: dict, prefix: str) -> dict:
    """torch nn.MultiheadAttention (fused in_proj) -> q/k/v/out_proj."""
    w = _t2n(sd[f'{prefix}.in_proj_weight'])      # (3D, D)
    b = _t2n(sd[f'{prefix}.in_proj_bias'])        # (3D,)
    d = w.shape[1]
    out = {}
    for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
        out[name] = {'kernel': w[i * d:(i + 1) * d].T,
                     'bias': b[i * d:(i + 1) * d]}
    out['out_proj'] = _linear(sd, f'{prefix}.out_proj')
    return out


def _norm(sd: dict, prefix: str) -> dict:
    return {'scale': _t2n(sd[f'{prefix}.weight']),
            'bias': _t2n(sd[f'{prefix}.bias'])}


def convert_state_dict(sd: dict, cfg) -> tuple[dict, dict]:
    """Map a reference RegTR state_dict onto our flax 'params' subtree.

    Args:
        sd: {key: tensor/array} — torch state_dict of the reference model
            built from the SAME config (architecture, dims).
        cfg: flat config (reference YAML keys), used to walk the block plan.

    Returns:
        (params, kernel_points): the nested 'params' dict for
        models/regtr.py:RegTR, and {kp_seed: (Kp, 3)} dispositions for
        ops.kernel_points.set_kernel_point_overrides.
    """
    from ..models.kpconv import encoder_plan

    sd = dict(sd)
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    use_bn = bool(cfg.get('use_batch_norm', True))
    if not use_bn:
        # With use_batch_norm off the reference replaces each norm with a
        # learned bias (kpconv_blocks.py:491); our conv blocks implement the
        # norm path only (no published config disables it).
        raise NotImplementedError("use_batch_norm: false checkpoints")
    params: dict = {}

    # ---- KPConv encoder (kpconv.py:22-92 <-> models/kpconv.py:KPFEncoder)
    blocks, _, _ = encoder_plan(cfg)
    enc: dict = {}
    kernel_points: dict = {}

    def _kpconv(rk: str, i: int, deform: bool) -> dict:
        """Map one reference KPConv's state onto our KPConvOp params.

        Dispositions (kernel_points buffers) go to the override registry
        keyed by the same kp_seed the flax module uses: block index `i` for
        the main conv, `i + 1000` for its offset_conv (models/kpconv.py).
        Deformable convs (kpconv_blocks.py:218-234,275-298) additionally
        carry offset_conv.{weights,kernel_points} and offset_bias.
        """
        out = {'weights': _t2n(take(f'{rk}.weights'))}
        if f'{rk}.kernel_points' in sd:
            kernel_points[i] = _t2n(take(f'{rk}.kernel_points'))
        if deform:
            out['offset_bias'] = _t2n(take(f'{rk}.offset_bias'))
            out['offset_conv'] = {
                'weights': _t2n(take(f'{rk}.offset_conv.weights'))}
            if f'{rk}.offset_conv.kernel_points' in sd:
                kernel_points[i + 1000] = _t2n(
                    take(f'{rk}.offset_conv.kernel_points'))
        return out

    for i, blk in enumerate(blocks):
        rk = f'kpf_encoder.encoder_blocks.{i}'
        deform = 'deform' in blk['name']
        ours: dict = {}
        if 'simple' in blk['name']:
            ours['KPConvOp_0'] = _kpconv(f'{rk}.KPConv', i, deform)
        else:  # resnetb / resnetb_strided (optionally deformable)
            mid = blk['out_dim'] // 4
            u = 0
            if blk['in_dim'] != mid:
                ours[f'UnaryBlock_{u}'] = _unary(sd, f'{rk}.unary1')
                consumed.add(f'{rk}.unary1.mlp.weight')
                u += 1
            ours['KPConvOp_0'] = _kpconv(f'{rk}.KPConv', i, deform)
            ours[f'UnaryBlock_{u}'] = _unary(sd, f'{rk}.unary2')
            consumed.add(f'{rk}.unary2.mlp.weight')
            u += 1
            if blk['in_dim'] != blk['out_dim']:
                ours[f'UnaryBlock_{u}'] = _unary(sd, f'{rk}.unary_shortcut')
                consumed.add(f'{rk}.unary_shortcut.mlp.weight')
        enc[f'blocks_{i}'] = ours
    params['kpf_encoder'] = enc

    # ---- heads and embeddings
    params['feat_proj'] = _linear(sd, 'feat_proj')
    consumed.update({'feat_proj.weight', 'feat_proj.bias'})
    params['overlap_predictor'] = _linear(sd, 'overlap_predictor')
    consumed.update({'overlap_predictor.weight', 'overlap_predictor.bias'})
    params['alpha'] = _t2n(take('alpha'))
    params['beta'] = _t2n(take('beta'))
    if 'feature_criterion.W' in sd:
        params['feature_criterion'] = {'W': _t2n(take('feature_criterion.W'))}
    # feature_criterion_un shares our single criterion (qk_regtr_full.py:92-93
    # keeps two instances; only the first participates in the active loss).
    consumed.add('feature_criterion_un.W')

    # ---- transformer (transformers.py:84 <-> models/transformer.py)
    tr: dict = {}
    nl = int(cfg.num_encoder_layers)
    for li in range(nl):
        lk = f'transformer_encoder.layers.{li}'
        layer = {
            'self_attn': _mha(sd, f'{lk}.self_attn'),
            'cross_attn': _mha(sd, f'{lk}.multihead_attn'),
            'linear1': _linear(sd, f'{lk}.linear1'),
            'linear2': _linear(sd, f'{lk}.linear2'),
            'norm1': _norm(sd, f'{lk}.norm1'),
            'norm2': _norm(sd, f'{lk}.norm2'),
            'norm3': _norm(sd, f'{lk}.norm3'),
        }
        tr[f'TransformerCrossEncoderLayer_{li}'] = layer
        # Consume exactly the keys mapped above — a blanket prefix sweep
        # would let variant params (e.g. add_bias_kv's bias_k/bias_v) slip
        # past the unmapped-key guard and be silently dropped.
        for att in ('self_attn', 'multihead_attn'):
            consumed.update({f'{lk}.{att}.in_proj_weight',
                             f'{lk}.{att}.in_proj_bias',
                             f'{lk}.{att}.out_proj.weight',
                             f'{lk}.{att}.out_proj.bias'})
        for sub in ('linear1', 'linear2', 'norm1', 'norm2', 'norm3'):
            consumed.update({f'{lk}.{sub}.weight', f'{lk}.{sub}.bias'})
    if 'transformer_encoder.norm.weight' in sd:
        tr['LayerNorm_0'] = _norm(sd, 'transformer_encoder.norm')
        consumed.update({'transformer_encoder.norm.weight',
                         'transformer_encoder.norm.bias'})
    params['transformer_encoder'] = tr

    # Learned position embedding (qk_regtr_full.py:56) — flagship uses sine
    # (no params); the learned variant is a 5-Linear MLP whose Linears sit at
    # Sequential indices 0,2,4,6,8 (position_embedding.py:53-72) and map onto
    # our PositionEmbeddingLearned's Dense_0..Dense_4.
    if any(k.startswith('pos_embed.') for k in sd):
        params['pos_embed'] = {
            f'Dense_{j}': _linear(sd, f'pos_embed.mlp.{2 * j}')
            for j in range(5)}
        for j in range(5):
            consumed.update({f'pos_embed.mlp.{2 * j}.weight',
                             f'pos_embed.mlp.{2 * j}.bias'})

    leftover = sorted(set(sd) - consumed)
    if leftover:
        raise ValueError(f"unmapped reference keys: {leftover[:8]}"
                         f"{' ...' if len(leftover) > 8 else ''}")
    return params, kernel_points


def fill_template(template, params: dict):
    """Validate `params` against the model's init shapes and return the tree
    with template dtypes. `template` is model.init's (eval_shape) output."""
    import jax
    import flax

    flat_t = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(template)['params'], sep='/')
    flat_p = flax.traverse_util.flatten_dict(params, sep='/')
    missing = sorted(set(flat_t) - set(flat_p))
    extra = sorted(set(flat_p) - set(flat_t))
    if missing or extra:
        raise ValueError(f"param tree mismatch: missing={missing[:6]} "
                         f"extra={extra[:6]}")
    out = {}
    for k, tv in flat_t.items():
        pv = np.asarray(flat_p[k])
        if tuple(tv.shape) != tuple(pv.shape):
            raise ValueError(f"{k}: shape {pv.shape} != expected {tv.shape}")
        out[k] = jax.numpy.asarray(pv, dtype=tv.dtype)
    return flax.core.freeze(
        {'params': flax.traverse_util.unflatten_dict(out, sep='/')})


def convert_checkpoint(ckpt_path, cfg, out_dir) -> None:
    """Load a reference .pth, convert, and write an orbax checkpoint dir
    (step 0, fresh optimizer state) + kernel_points.npz, both consumed by
    `--resume` (train/cli.py auto-installs the overrides)."""
    import torch
    import jax

    from ..data.collate import collate_pairs
    from ..data.synthetic import SyntheticPairDataset
    from ..models import build_model
    from ..parallel.train_step import TrainState
    from ..train.checkpoint import CheckpointManager
    from ..train.optim import make_optimizer
    from ..ops.kernel_points import set_kernel_point_overrides

    raw = torch.load(ckpt_path, map_location='cpu', weights_only=False)
    sd = raw.get('state_dict', raw) if isinstance(raw, dict) else raw
    # Trainer-style prefixes (model.xxx) from the reference's CheckPointManager.
    sd = {(k[6:] if k.startswith('model.') else k): v for k, v in sd.items()}
    params, kps = convert_state_dict(sd, cfg)

    # Install only for the eval_shape trace below, then clear: the registry
    # is process-global and a library caller's NEXT model must not silently
    # inherit these dispositions.
    set_kernel_point_overrides(kps)
    try:
        model = build_model(cfg.get('model', 'regtr.RegTR'), cfg)
        budget = int(cfg.level_budgets[0])
        ds = SyntheticPairDataset(size=1, n_points=min(budget, 1024), seed=0)
        batch = collate_pairs([ds[0]], budget, np.random.default_rng(0))
        # compute_loss=True (default) so loss-module params
        # (feature_criterion.W) appear in the template; eval_shape must not
        # trace the static flag.
        template = jax.eval_shape(lambda k, b: model.init(k, b),
                                  jax.random.PRNGKey(0),
                                  {k: jax.numpy.asarray(v)
                                   for k, v in batch.items()})
        tree = fill_template(template, params)
    finally:
        set_kernel_point_overrides(None)

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / 'kernel_points.npz',
             **{str(k): v for k, v in kps.items()})
    state = TrainState.create(tree, make_optimizer(cfg))
    mgr = CheckpointManager(out_dir / 'ckpt', max_to_keep=1)
    mgr.save(0, state)
    mgr.wait()
    print(f"converted {len(jax.tree_util.tree_leaves(tree))} tensors "
          f"+ {len(kps)} kernel dispositions -> {out_dir}")


def maybe_install_kernel_overrides(resume_path) -> bool:
    """If `resume_path` (a checkpoint dir, or its parent) was produced by
    convert_checkpoint, install its kernel dispositions; otherwise CLEAR any
    previously installed ones (the override registry is process-global, and
    a leftover installation would silently pair a normal checkpoint's
    weights with foreign dispositions). Call before the model is traced.
    Returns True if overrides were installed."""
    from ..ops.kernel_points import (load_kernel_point_overrides,
                                     set_kernel_point_overrides)

    p = pathlib.Path(resume_path)
    for cand in (p / 'kernel_points.npz', p.parent / 'kernel_points.npz'):
        if cand.exists():
            set_kernel_point_overrides(load_kernel_point_overrides(cand))
            return True
    set_kernel_point_overrides(None)
    return False


def main(argv=None):
    from ..config import load_builtin, load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--ckpt', required=True, help='reference .pth checkpoint')
    ap.add_argument('--config', required=True,
                    help='builtin config name or YAML path (must match the '
                         'architecture the checkpoint was trained with)')
    ap.add_argument('--out', required=True, help='output checkpoint dir')
    args = ap.parse_args(argv)
    cfg = (load_config(args.config) if args.config.endswith(('.yaml', '.yml'))
           else load_builtin(args.config))
    convert_checkpoint(args.ckpt, cfg, args.out)


if __name__ == '__main__':
    main()
