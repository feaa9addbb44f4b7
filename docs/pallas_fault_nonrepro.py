import sys
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np, jax, jax.numpy as jnp
from test_model import tiny_config, make_batch
from superpoints_registration_tpu.config import as_static
from superpoints_registration_tpu.ops.pyramid import PyramidSpec, build_pyramid
from superpoints_registration_tpu.ops.pallas.gather import gather_coords_feats_batch
from superpoints_registration_tpu.ops.kernel_points import load_kernel_points
from superpoints_registration_tpu.models.common import masked_instance_norm

cfg = tiny_config(level_budgets=[256, 128])
spec = PyramidSpec.from_config(cfg)
batch = {k: jnp.asarray(v) for k, v in make_batch(n_pairs=2, n_points=220, budget=256).items()}
pts_in = jnp.concatenate([batch['src_points'], batch['tgt_points']], 0)
msk_in = jnp.concatenate([batch['src_mask'], batch['tgt_mask']], 0)
meta = jax.tree_util.tree_map(jnp.asarray, build_pyramid(pts_in, msk_in, spec, chunk=1024))

pts = meta['points'][0]; idx = meta['neighbors'][0]; mask = meta['masks'][0]
C = 1
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(4, 256, C)).astype(np.float32))
kp_np = load_kernel_points(0.165, 15, 3, 'center', seed=0)
W = jnp.asarray(rng.normal(size=(15, C, 8)).astype(np.float32))
extent = 0.12

# Variant A: real meta passed as ARGUMENTS
@jax.jit
def fa(pts, idx, mask, feats):
    kp = jnp.asarray(kp_np)
    nb, nx, dr = gather_coords_feats_batch(pts, feats, idx, block=256, window_blocks=2)
    rel = nb - pts[:, :, None, :]
    sq = jnp.maximum(jnp.sum(rel*rel, -1, keepdims=True)
                     - 2*jnp.einsum('bnkd,pd->bnkp', rel, kp) + jnp.sum(kp*kp, -1), 0.0)
    aw = jnp.clip(1.0 - jnp.sqrt(sq)/extent, 0.0, None)
    weighted = jnp.einsum('bnkp,bnkc->bnpc', aw, nx)
    out = jnp.einsum('bnpc,pcd->bnd', weighted, W, preferred_element_type=jnp.float32)
    contrib = jnp.maximum(jnp.sum(jnp.sum(nx, -1) > 0, -1), 1)
    return jnp.sum(jax.nn.leaky_relu(masked_instance_norm(out / contrib[..., None], mask), 0.1))
try:
    vals = [float(fa(pts, idx, mask, feats)) for _ in range(4)]
    print("A real-meta-as-args x4:", "OK" if len(set(vals))==1 else vals, flush=True)
except Exception as e:
    print("A real-meta-as-args x4 FAIL:", str(e)[:60], flush=True)
    sys.exit(0)  # device poisoned, stop

# Variant B: real meta as CLOSURE constants (like the failing dbg_blocks2)
@jax.jit
def fb(feats):
    return fa.__wrapped__(pts, idx, mask, feats)
try:
    vals = [float(fb(feats)) for _ in range(4)]
    print("B real-meta-as-constants x4:", "OK" if len(set(vals))==1 else vals, flush=True)
except Exception as e:
    print("B real-meta-as-constants x4 FAIL:", str(e)[:60], flush=True)
