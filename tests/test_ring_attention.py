"""Ring attention (sequence-parallel exact attention) on the 8-device mesh.

The SP/CP long-context path (SURVEY §5.7): K/V shards rotate around the mesh
ring via ppermute while a flash recurrence combines partials. Everything here
asserts EQUALITY against plain dense softmax attention — ring is exact, not
an approximation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superpoints_registration_tpu.parallel.mesh import make_mesh_2d
from superpoints_registration_tpu.parallel.ring_attention import (
    RingMultiheadAttention, ring_attention, set_ring_mesh)


def dense_attention(q, k, v, key_valid):
    """Reference: plain softmax attention with key masking."""
    s = np.einsum('bhqd,bhkd->bhqk', q, k) / np.sqrt(q.shape[-1])
    s = np.where(key_valid[:, None, None, :], s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum('bhqk,bhkd->bhqd', p, v)


@pytest.fixture(scope='module')
def rngf():
    return np.random.default_rng(7)


class TestRingCore:
    def test_matches_dense_seq8(self, rngf):
        """Pure sequence parallelism: 8 devices all on the seq axis."""
        mesh = make_mesh_2d(1, 8)
        b, h, n, d = 2, 4, 64, 16
        q = rngf.normal(size=(b, h, n, d)).astype(np.float32)
        k = rngf.normal(size=(b, h, n, d)).astype(np.float32)
        v = rngf.normal(size=(b, h, n, d)).astype(np.float32)
        mask = rngf.uniform(size=(b, n)) > 0.3
        got = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                        jnp.asarray(v), jnp.asarray(mask),
                                        mesh))
        want = dense_attention(q, k, v, mask)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_matches_dense_2d_mesh_cross_shapes(self, rngf):
        """(data=2, seq=4) mesh, cross attention with Nq != Nk."""
        mesh = make_mesh_2d(2, 4)
        b, h, nq, nk, d = 4, 2, 24, 40, 8
        q = rngf.normal(size=(b, h, nq, d)).astype(np.float32)
        k = rngf.normal(size=(b, h, nk, d)).astype(np.float32)
        v = rngf.normal(size=(b, h, nk, d)).astype(np.float32)
        mask = rngf.uniform(size=(b, nk)) > 0.3
        got = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                        jnp.asarray(v), jnp.asarray(mask),
                                        mesh))
        want = dense_attention(q, k, v, mask)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_gradients_match_dense(self, rngf):
        """Backward through the ring (scan + ppermute) equals dense grads —
        ring attention must be trainable, not inference-only."""
        mesh = make_mesh_2d(1, 8)
        b, h, n, d = 1, 2, 32, 8
        q = jnp.asarray(rngf.normal(size=(b, h, n, d)), jnp.float32)
        k = jnp.asarray(rngf.normal(size=(b, h, n, d)), jnp.float32)
        v = jnp.asarray(rngf.normal(size=(b, h, n, d)), jnp.float32)
        mask = jnp.ones((b, n), bool)

        def ring_loss(q, k, v):
            return jnp.sum(ring_attention(q, k, v, mask, mesh) ** 2)

        def dense_loss(q, k, v):
            s = jnp.einsum('bhqd,bhkd->bhqk', q, k) / np.sqrt(d)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.sum(jnp.einsum('bhqk,bhkd->bhqd', p, v) ** 2)

        g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
        g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
        for gr, gd in zip(g_ring, g_dense):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(gd),
                                       atol=3e-5)

    def test_matches_chunked_at_kitti_scale(self, rngf):
        """Ring at its design point (VERDICT r4 §weak-5): S = 32,768 — the
        KITTI max_points / level-0 budget (regtr_kitti.yaml) where dense
        S x S scores (4 GiB per head, f32) stop fitting and SP/CP is the
        reason ring attention exists. Dense reference is infeasible at this
        size, so equality is asserted against chunked_attention, which is
        itself equality-tested against dense above at small S."""
        from superpoints_registration_tpu.models.mem_eff_attention import (
            chunked_attention)
        mesh = make_mesh_2d(1, 8)
        b, h, n, d = 1, 2, 32768, 32
        q = jnp.asarray(rngf.normal(size=(b, h, n, d)), jnp.float32)
        k = jnp.asarray(rngf.normal(size=(b, h, n, d)), jnp.float32)
        v = jnp.asarray(rngf.normal(size=(b, h, n, d)), jnp.float32)
        mask = jnp.asarray(rngf.uniform(size=(b, n)) > 0.3)
        got = np.asarray(ring_attention(q, k, v, mask, mesh))
        want = np.asarray(chunked_attention(q, k, v, mask))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_all_invalid_keys_stay_finite(self, rngf):
        mesh = make_mesh_2d(1, 8)
        q = jnp.asarray(rngf.normal(size=(1, 1, 8, 4)), jnp.float32)
        k = jnp.asarray(rngf.normal(size=(1, 1, 8, 4)), jnp.float32)
        v = jnp.asarray(rngf.normal(size=(1, 1, 8, 4)), jnp.float32)
        mask = jnp.zeros((1, 8), bool)
        out = np.asarray(ring_attention(q, k, v, mask, mesh))
        assert np.isfinite(out).all()

    def test_indivisible_sequence_rejected(self, rngf):
        mesh = make_mesh_2d(1, 8)
        q = jnp.zeros((1, 1, 12, 4))
        with pytest.raises(ValueError, match='divide'):
            ring_attention(q, q, q, None, mesh)


class TestRingModule:
    def test_module_matches_chunked_mha(self, rngf):
        """RingMultiheadAttention == ChunkedMultiheadAttention given the
        SAME params (identical q/k/v/out projection structure + init)."""
        from superpoints_registration_tpu.models.mem_eff_attention import (
            ChunkedMultiheadAttention)
        mesh = make_mesh_2d(2, 4)
        set_ring_mesh(mesh)
        try:
            d_model, nhead = 32, 4
            b, nq, nk = 2, 16, 24
            q = jnp.asarray(rngf.normal(size=(b, nq, d_model)), jnp.float32)
            k = jnp.asarray(rngf.normal(size=(b, nk, d_model)), jnp.float32)
            v = k
            mask = jnp.asarray(rngf.uniform(size=(b, nk)) > 0.2)
            ring = RingMultiheadAttention(d_model, nhead)
            params = ring.init(jax.random.PRNGKey(1), q, k, v, mask)
            got = np.asarray(ring.apply(params, q, k, v, mask))
            chunked = ChunkedMultiheadAttention(d_model, nhead)
            want = np.asarray(chunked.apply(params, q, k, v, mask))
            np.testing.assert_allclose(got, want, atol=3e-5)
        finally:
            set_ring_mesh(None)

    def test_module_requires_mesh(self):
        ring = RingMultiheadAttention(8, 2)
        x = jnp.zeros((1, 8, 8))
        with pytest.raises(RuntimeError, match='set_ring_mesh'):
            ring.init(jax.random.PRNGKey(0), x, x, x)


class TestRingEndToEnd:
    def test_regtr_train_step_with_ring_attention(self):
        """Full RegTR train step with attention_impl='ring' on a (data=2,
        seq=4) mesh: compiles, runs, loss finite and close to the dense
        model's loss with transplanted params."""
        from test_model import tiny_config, make_batch
        from superpoints_registration_tpu.models import build_model
        from superpoints_registration_tpu.parallel.mesh import (replicated,
                                                                shard_batch)
        from superpoints_registration_tpu.parallel.train_step import (
            TrainState, make_train_step)
        from superpoints_registration_tpu.train.optim import make_optimizer

        mesh = make_mesh_2d(2, 4)
        cfg = tiny_config()
        cfg.train_batch_size = 2
        # Coarse level must divide the seq axis (4); tiny_config's pyramid
        # budgets already do (powers of two).
        batch = {k: jnp.asarray(v) for k, v in
                 make_batch(n_pairs=2, n_points=128, budget=128).items()}

        cfg.attention_impl = 'ring'
        set_ring_mesh(mesh)
        try:
            model = build_model('regtr.RegTR', cfg)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
            host_params = jax.device_get(params)  # step donates its state
            tx = make_optimizer(cfg)
            state = jax.device_put(TrainState.create(params, tx),
                                   replicated(mesh))
            step = make_train_step(model, tx, mesh=mesh)
            state, losses = step(state, shard_batch(batch, mesh))
            ring_loss = float(losses['total'])
            assert np.isfinite(ring_loss)
        finally:
            set_ring_mesh(None)

        # Dense model, same params (ring/chunked/dense MHA share the
        # q/k/v/out projection structure) — losses must agree.
        cfg2 = tiny_config()
        cfg2.train_batch_size = 2
        model_d = build_model('regtr.RegTR', cfg2)
        out = model_d.apply(host_params, batch)
        dense_loss = float(out['losses']['total'])
        np.testing.assert_allclose(ring_loss, dense_loss, rtol=1e-4)
