"""Pallas windowed gather: interpret-mode correctness on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superpoints_registration_tpu.ops.pallas.gather import (
    SHADOW_FAR, gather_coords_feats_batch, gather_rows_windowed,
    split_f32_to_bf16_hi_lo)


class TestWindowedGather:
    def test_local_indices_exact(self, rng):
        n, d, r = 600, 12, 2048
        table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        # Indices clustered so every tile's window covers them.
        idx = jnp.asarray(np.clip(np.arange(r) % n
                                  + rng.integers(-50, 50, r), 0, n - 1)
                          .astype(np.int32))
        out, covered = gather_rows_windowed(table, idx, row_tile=256,
                                            block=512, window_blocks=2,
                                            interpret=True)
        exp = np.asarray(table).astype(np.float32)[np.asarray(idx)]
        got = np.asarray(out)
        cov = np.asarray(covered)
        np.testing.assert_allclose(got[cov], exp[cov])
        assert cov.mean() > 0.95

    def test_shadow_rows_zero(self, rng):
        n, d = 300, 8
        table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        idx = jnp.full((512,), SHADOW_FAR, jnp.int32)
        out, covered = gather_rows_windowed(table, idx, row_tile=256,
                                            block=512, window_blocks=2,
                                            interpret=True)
        assert not np.asarray(covered).any()
        assert np.all(np.asarray(out) == 0)

    def test_hi_lo_split_precision(self, rng):
        x = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32) * 50)
        hi, lo = split_f32_to_bf16_hi_lo(x)
        back = hi.astype(jnp.float32) + lo.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=2e-5)

    def test_coords_feats_batch_interpret(self, rng):
        b, n, q, k, c = 2, 256, 256, 8, 4
        pts = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        base = (np.arange(q) % n)[None, :, None]
        idx_np = np.clip(base + rng.integers(-20, 20, (b, q, k)), 0, n - 1)
        idx_np[:, :3, :2] = n  # shadows
        idx = jnp.asarray(idx_np.astype(np.int32))
        coords, gf, dropped = gather_coords_feats_batch(
            pts, feats, idx, block=256, window_blocks=2, row_tile=256,
            interpret=True)
        pts_np = np.asarray(pts)
        ok = (idx_np < n) & (np.asarray(coords)[..., 0] < 1e5)
        exp_c = pts_np[np.arange(b)[:, None, None], np.clip(idx_np, 0, n - 1)]
        err = np.abs(np.asarray(coords) - exp_c)[ok].max()
        assert err < 1e-4
        # shadow rows -> far coords + zero feats
        assert np.all(np.asarray(coords)[idx_np == n] == 1e6)
        assert np.all(np.asarray(gf)[idx_np == n] == 0)

    def test_gradients_flow_to_table(self, rng):
        b, n, q, k, c = 1, 128, 128, 4, 4
        pts = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        idx = jnp.asarray((np.arange(q) % n)[None, :, None]
                          .repeat(k, 2).astype(np.int32))

        def loss(feats):
            _, gf, _ = gather_coords_feats_batch(
                pts, feats, idx, block=128, window_blocks=1, row_tile=128,
                interpret=True)
            return jnp.sum(gf ** 2)

        g = jax.grad(loss)(feats)
        assert np.any(np.asarray(g) != 0)
        assert np.all(np.isfinite(np.asarray(g)))
