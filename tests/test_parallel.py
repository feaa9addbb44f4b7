"""SPMD tests on the simulated 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superpoints_registration_tpu.config import Config
from superpoints_registration_tpu.models import build_model
from superpoints_registration_tpu.parallel.mesh import (
    make_mesh, replicated, shard_batch)
from superpoints_registration_tpu.parallel.train_step import (
    TrainState, make_train_step, make_eval_step)
from superpoints_registration_tpu.train.optim import make_optimizer

from test_model import tiny_config, make_batch


@pytest.fixture(scope='module')
def setup():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh()
    cfg = tiny_config()
    cfg.train_batch_size = 8
    model = build_model('regtr.RegTR', cfg)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(n_pairs=8, n_points=128, budget=128).items()}
    params = jax.device_get(jax.jit(model.init)(jax.random.PRNGKey(0), batch))
    return mesh, cfg, model, batch, params


class TestSPMD:
    def test_batch_sharded_over_mesh(self, setup):
        mesh, cfg, model, batch, params = setup
        sharded = shard_batch(batch, mesh)
        shard_shapes = [s.data.shape for s in sharded['src_points'].addressable_shards]
        assert len(shard_shapes) == 8
        assert all(s[0] == 1 for s in shard_shapes)  # 1 pair per device

    def test_sharded_train_step_matches_single_device(self, setup):
        mesh, cfg, model, batch, params = setup
        tx = make_optimizer(cfg)
        host_params = jax.device_get(params)  # train steps donate their state

        # 8-device run
        state = jax.device_put(TrainState.create(host_params, tx),
                               replicated(mesh))
        step8 = make_train_step(model, tx, mesh=mesh)
        state8, losses8 = step8(state, shard_batch(batch, mesh))

        # single-device run
        step1 = make_train_step(model, tx, mesh=None)
        state1, losses1 = step1(TrainState.create(jax.device_get(host_params), tx),
                                batch)

        np.testing.assert_allclose(float(losses8['total']),
                                   float(losses1['total']), rtol=1e-5)
        a = jax.tree_util.tree_leaves(jax.device_get(state8.params))
        b = jax.tree_util.tree_leaves(jax.device_get(state1.params))
        for x, y in zip(a, b):
            # psum reduction order vs single-device accumulation differs in
            # fp32; AdamW's rsqrt amplifies it for near-zero second moments.
            np.testing.assert_allclose(x, y, atol=3e-4)

    def test_eval_step_sharded(self, setup):
        mesh, cfg, model, batch, params = setup
        eval_step = make_eval_step(model, cfg, mesh=mesh)
        small, losses, metrics = eval_step(params, shard_batch(batch, mesh))
        assert small['pose'].shape == (8, 3, 4)
        assert np.isfinite(float(losses['total']))

    def test_nonfinite_loss_skips_update(self, setup):
        mesh, cfg, model, batch, params = setup
        tx = make_optimizer(cfg)
        state = TrainState.create(jax.device_get(params), tx)
        bad = dict(batch)
        bad['src_points'] = batch['src_points'].at[0, 0, 0].set(jnp.nan)
        step = make_train_step(model, tx, mesh=None)
        new_state, losses = step(state, bad)
        assert not np.isfinite(float(losses['total']))
        a = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        b = jax.tree_util.tree_leaves(jax.device_get(params))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)  # params unchanged
