"""Serving inference API tests (infer.Registrar)."""
import numpy as np
import jax
import pytest

from superpoints_registration_tpu.config import Config
from superpoints_registration_tpu.infer import Registrar
from superpoints_registration_tpu.models import build_model
from superpoints_registration_tpu.ops import lie_np, se3

from test_model import tiny_config, make_batch


@pytest.fixture(scope='module')
def registrar():
    cfg = tiny_config()
    model = build_model('regtr.RegTR', cfg)
    reg = Registrar(cfg, model, None, batch_size=2)
    dummy = reg._collate([(np.zeros((4, 3), np.float32),
                           np.zeros((4, 3), np.float32))])
    reg.params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
    return reg


class TestRegistrar:
    def test_register_returns_finite_pose(self, registrar, rng):
        src = rng.normal(size=(100, 3)).astype(np.float32)
        pose = np.concatenate([lie_np.sample_rotation_small(rng, 0.1),
                               rng.normal(size=(3, 1)) * 0.1], 1).astype(np.float32)
        tgt = lie_np.se3_transform(pose, src)
        out = registrar.register(src, tgt)
        assert out['pose'].shape == (3, 4)
        assert np.all(np.isfinite(out['pose']))
        assert out['corr_src'].shape == out['corr_tgt'].shape
        assert (out['corr_weight'] > 0).all()

    def test_register_batch_matches_single(self, registrar, rng):
        pairs = []
        for _ in range(3):
            src = rng.normal(size=(80, 3)).astype(np.float32)
            pose = np.concatenate([lie_np.sample_rotation_small(rng, 0.1),
                                   rng.normal(size=(3, 1)) * 0.1], 1).astype(np.float32)
            pairs.append((src, lie_np.se3_transform(pose, src)))
        outs = registrar.register_batch(pairs)
        assert len(outs) == 3
        single = registrar.register(*pairs[0])
        np.testing.assert_allclose(outs[0]['pose'], single['pose'], atol=1e-5)

    def test_mesh_sharded_serving_matches_single_device(self, registrar, rng):
        """Multi-chip serving: an 8-device data-parallel mesh produces the
        same poses as the unsharded Registrar (params replicate, the pair
        axis shards, XLA partitions the whole jitted forward)."""
        from superpoints_registration_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 simulated devices")
        mesh = make_mesh(jax.devices()[:8])
        sharded = Registrar(registrar.cfg, registrar.model, registrar.params,
                            batch_size=2, mesh=mesh)
        assert sharded.batch_size == 8  # rounded up to the mesh size
        pairs = []
        for _ in range(3):
            src = rng.normal(size=(80, 3)).astype(np.float32)
            pose = np.concatenate([lie_np.sample_rotation_small(rng, 0.1),
                                   rng.normal(size=(3, 1)) * 0.1],
                                  1).astype(np.float32)
            pairs.append((src, lie_np.se3_transform(pose, src)))
        outs = sharded.register_batch(pairs)
        ref = registrar.register_batch(pairs)
        assert len(outs) == 3
        for got, want in zip(outs, ref):
            np.testing.assert_allclose(got['pose'], want['pose'], atol=1e-4)
