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


class TestMultiHostSharding:
    """The multi-host story can't run multi-process here; these verify the
    sharding MATH: per-host loader shards are disjoint, cover the dataset,
    and assemble into the same global batch regardless of host count."""

    def _mk_loader(self, num_shards, shard_index, seed=3, bs=2):
        from superpoints_registration_tpu.data.loader import DataLoader
        from superpoints_registration_tpu.data.synthetic import SyntheticPairDataset
        ds = SyntheticPairDataset(size=32, n_points=64, seed=0)
        return DataLoader(ds, batch_size=bs, budget=64, shuffle=True,
                          seed=seed, num_shards=num_shards,
                          shard_index=shard_index, prefetch=0, pad_rng=False)

    def test_shards_disjoint_and_cover(self):
        # Identify samples by their pose bytes (unique per index).
        def keys(loader, epoch):
            loader.set_epoch(epoch)
            out = []
            for b in loader:
                out.extend(b['pose'][i].tobytes() for i in range(len(b['pose'])))
            return out

        full = keys(self._mk_loader(1, 0), epoch=1)
        sh0 = keys(self._mk_loader(4, 0), epoch=1)
        others = [keys(self._mk_loader(4, i), epoch=1) for i in range(1, 4)]
        allsh = sh0 + sum(others, [])
        assert len(allsh) == len(set(allsh)), "shards overlap"
        assert set(allsh) == set(full), "shards do not cover the dataset"
        assert all(len(s) == len(sh0) for s in others), "unbalanced shards"

    def test_shard_order_deterministic_across_hosts(self):
        # Two processes with the same seed/epoch must agree on the global
        # permutation (each takes its own stride of the SAME order).
        a = self._mk_loader(2, 0)
        b = self._mk_loader(2, 0)
        a.set_epoch(5)
        b.set_epoch(5)
        pa = [bt['pose'].tobytes() for bt in a]
        pb = [bt['pose'].tobytes() for bt in b]
        assert pa == pb

    def test_host_local_to_global_single_process(self):
        from superpoints_registration_tpu.parallel.mesh import (
            host_local_to_global, make_mesh)
        mesh = make_mesh()
        batch = {'x': np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
        g = host_local_to_global(batch, mesh)
        assert g['x'].shape == (8, 3)
        np.testing.assert_array_equal(np.asarray(g['x']), batch['x'])
        assert len(g['x'].addressable_shards) == 8
