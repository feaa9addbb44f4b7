"""Tests for chunked attention and reversible blocks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superpoints_registration_tpu.models.mem_eff_attention import (
    ChunkedMultiheadAttention, chunked_attention)
from superpoints_registration_tpu.models.revvit import ReversibleEncoder
from superpoints_registration_tpu.models.transformer import MultiheadAttention


class TestChunkedAttention:
    def test_matches_dense_softmax(self, rng):
        b, h, nq, nk, d = 2, 4, 256, 512, 32
        q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        valid = jnp.asarray(rng.random((b, nk)) > 0.3)

        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k) / (d ** 0.5)
        scores = jnp.where(valid[:, None, None, :], scores, -1e9)
        expected = jnp.einsum('bhqk,bhkd->bhqd', jax.nn.softmax(scores, -1), v)

        got = chunked_attention(q, k, v, valid, q_chunk=64, k_chunk=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=2e-5)

    def test_mha_wrapper_matches_dense_mha(self, rng):
        b, n, d_model, h = 2, 200, 64, 4
        x = jnp.asarray(rng.normal(size=(b, n, d_model)).astype(np.float32))
        valid = jnp.asarray(np.ones((b, n), bool))
        dense = MultiheadAttention(d_model, h)
        chunked = ChunkedMultiheadAttention(d_model, h, q_chunk=64, k_chunk=64)
        params = dense.init(jax.random.PRNGKey(0), x, x, x, valid)
        out_d = dense.apply(params, x, x, x, valid)
        out_c = chunked.apply(params, x, x, x, valid)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                                   atol=2e-5)

    def test_gradients(self, rng):
        b, h, n, d = 1, 2, 128, 16
        q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))

        def loss(q):
            return jnp.sum(chunked_attention(q, q, q, q_chunk=64, k_chunk=64))

        g = jax.grad(loss)(q)
        assert np.all(np.isfinite(np.asarray(g)))


class TestReversibleEncoder:
    def test_forward_matches_block_sequence(self, rng):
        dim, depth = 32, 3
        model = ReversibleEncoder(dim=dim, nhead=4, depth=depth)
        x = jnp.asarray(rng.normal(size=(2, 64, 2 * dim)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_custom_vjp_matches_autodiff(self, rng):
        dim, depth = 16, 2
        model = ReversibleEncoder(dim=dim, nhead=2, depth=depth)
        x = jnp.asarray(rng.normal(size=(1, 32, 2 * dim)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)

        def loss_custom(p, x):
            return jnp.sum(model.apply(p, x) ** 2)

        # Reference: plain sequential application of the same blocks.
        def loss_plain(p, x):
            x1, x2 = jnp.split(x, 2, axis=-1)
            for i in range(depth):
                blk_params = p['params'][f'blocks_{i}']
                from superpoints_registration_tpu.models.revvit import ReversibleBlock
                blk = ReversibleBlock(dim=dim, nhead=2)
                x1, x2 = blk.apply({'params': blk_params}, x1, x2)
            return jnp.sum(jnp.concatenate([x1, x2], -1) ** 2)

        v1 = float(loss_custom(params, x))
        v2 = float(loss_plain(params, x))
        np.testing.assert_allclose(v1, v2, rtol=1e-5)

        g1 = jax.grad(loss_custom)(params, x)
        g2 = jax.grad(loss_plain)(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
