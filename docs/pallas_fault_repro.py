import sys
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np, jax, jax.numpy as jnp
from test_model import tiny_config, make_batch
from superpoints_registration_tpu.config import as_static
from superpoints_registration_tpu.models.kpconv import SimpleBlock, ResnetBottleneckBlock, KPFEncoder
from superpoints_registration_tpu.ops.pyramid import PyramidSpec, build_pyramid

cfg = tiny_config(level_budgets=[256, 128], gather_impl='pallas',
                  gather_block=256, gather_window_blocks=2)
spec = PyramidSpec.from_config(cfg)
batch = {k: jnp.asarray(v) for k, v in make_batch(n_pairs=2, n_points=220, budget=256).items()}
pts = jnp.concatenate([batch['src_points'], batch['tgt_points']], 0)
msk = jnp.concatenate([batch['src_mask'], batch['tgt_mask']], 0)
meta = jax.tree_util.tree_map(jnp.asarray, build_pyramid(pts, msk, spec, chunk=1024))
scfg = as_static(cfg)

def try4(name, mod, x):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x, meta)
    f = jax.jit(lambda p: jnp.sum(mod.apply(p, x, meta)))
    try:
        vals = [float(f(params)) for _ in range(4)]
        print(f"{name} x4 ok ({vals[0]:.3f})", flush=True)
    except Exception as e:
        print(f"{name} x4 FAIL: {str(e)[:70]}", flush=True)

try4("simple", SimpleBlock(block_name='simple', in_dim=1, out_dim=16,
                           radius=spec.radii[0], layer_ind=0, config=scfg), 
     jnp.ones((4, 256, 1), jnp.float32))
try4("resnetb", ResnetBottleneckBlock(block_name='resnetb', in_dim=8, out_dim=16,
                                      radius=spec.radii[0], layer_ind=0, config=scfg),
     jnp.ones((4, 256, 8), jnp.float32))
try4("resnetb_strided", ResnetBottleneckBlock(block_name='resnetb_strided', in_dim=16,
                                              out_dim=16, radius=spec.radii[0],
                                              layer_ind=0, config=scfg),
     jnp.ones((4, 256, 16), jnp.float32))

# NOTE: On the round-3/4 environment image this script reproduced an
# environment-level TPU runtime fault ("INVALID_ARGUMENT: TPU backend
# error" on the 2nd+ dispatch, device then poisoned) when the repo's Pallas
# gather kernels ran inside flax KPConv blocks, while the byte-equivalent
# hand-written math in pallas_fault_nonrepro.py passed deterministically.
# RESOLVED UPSTREAM: on the round-5 image (2026-08-20) all blocks pass x4
# dispatches — the fault was a runtime bug, not a kernel bug, as diagnosed.
# The kernel stays opt-in anyway: measured end-to-end it is slower (17.17
# vs 30.44 pairs/s) and less accurate (-0.62% recall) than the fused XLA
# take. See docs/PERF.md round-5 + docs/ABLATION.md.
