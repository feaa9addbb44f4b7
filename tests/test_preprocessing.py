"""Parity tests for on-device voxel subsampling, radius-kNN and the pyramid."""
import numpy as np
import jax.numpy as jnp
import pytest

from superpoints_registration_tpu.ops.subsample import voxel_subsample, voxel_subsample_batch
from superpoints_registration_tpu.ops.neighbors import radius_knn, radius_knn_batch
from superpoints_registration_tpu.ops.pyramid import PyramidSpec, build_pyramid

from oracle_np import voxel_subsample_oracle, radius_neighbors_oracle


def pad_cloud(pts, budget):
    n = len(pts)
    out = np.zeros((budget, 3), np.float32)
    out[:n] = pts
    mask = np.zeros(budget, bool)
    mask[:n] = True
    return out, mask


class TestVoxelSubsample:
    def test_matches_oracle(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        expected = voxel_subsample_oracle(pts.astype(np.float64), 0.3)
        padded, mask = pad_cloud(pts, 512)
        out, out_mask, n_vox = voxel_subsample(jnp.asarray(padded), jnp.asarray(mask),
                                               0.3, 512)
        out, out_mask = np.asarray(out), np.asarray(out_mask)
        assert int(n_vox) == len(expected)
        assert out_mask.sum() == len(expected)
        # Output is Morton-ordered; compare as sorted row sets.
        np.testing.assert_allclose(np.sort(out[out_mask], axis=0),
                                   np.sort(expected, axis=0), atol=1e-5)
        # padded slots zeroed
        assert np.all(out[~out_mask] == 0)

    def test_single_voxel(self):
        pts = np.full((10, 3), 0.05, np.float32)
        padded, mask = pad_cloud(pts, 16)
        out, out_mask, n_vox = voxel_subsample(jnp.asarray(padded), jnp.asarray(mask),
                                               1.0, 16)
        assert int(n_vox) == 1
        np.testing.assert_allclose(np.asarray(out)[0], 0.05, atol=1e-6)

    def test_budget_overflow_drops_and_reports(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32) * 100  # all distinct voxels
        padded, mask = pad_cloud(pts, 128)
        out, out_mask, n_vox = voxel_subsample(jnp.asarray(padded), jnp.asarray(mask),
                                               0.1, 32)
        assert int(n_vox) == 100
        assert np.asarray(out_mask).sum() == 32

    def test_all_invalid(self):
        padded = np.zeros((16, 3), np.float32)
        mask = np.zeros(16, bool)
        out, out_mask, n_vox = voxel_subsample(jnp.asarray(padded), jnp.asarray(mask),
                                               0.1, 8)
        assert int(n_vox) == 0
        assert not np.asarray(out_mask).any()
        assert np.all(np.isfinite(np.asarray(out)))

    def test_negative_coordinates(self, rng):
        pts = (rng.normal(size=(200, 3)) - 5.0).astype(np.float32)
        expected = voxel_subsample_oracle(pts.astype(np.float64), 0.25)
        padded, mask = pad_cloud(pts, 256)
        out, out_mask, n_vox = voxel_subsample(jnp.asarray(padded), jnp.asarray(mask),
                                               0.25, 256)
        assert int(n_vox) == len(expected)
        np.testing.assert_allclose(np.sort(np.asarray(out)[np.asarray(out_mask)], axis=0),
                                   np.sort(expected, axis=0), atol=1e-5)

    def test_batched(self, rng):
        clouds = [rng.normal(size=(300 + 50 * i, 3)).astype(np.float32) for i in range(3)]
        padded = np.stack([pad_cloud(c, 512)[0] for c in clouds])
        masks = np.stack([pad_cloud(c, 512)[1] for c in clouds])
        out, out_mask, n_vox = voxel_subsample_batch(jnp.asarray(padded),
                                                     jnp.asarray(masks), 0.3, 512)
        for b, c in enumerate(clouds):
            expected = voxel_subsample_oracle(c.astype(np.float64), 0.3)
            assert int(n_vox[b]) == len(expected)
            np.testing.assert_allclose(
                np.sort(np.asarray(out[b])[np.asarray(out_mask[b])], axis=0),
                np.sort(expected, axis=0), atol=1e-5)


class TestRadiusKnn:
    def test_matches_oracle_sets(self, rng):
        q = rng.normal(size=(100, 3)).astype(np.float32)
        s = rng.normal(size=(200, 3)).astype(np.float32)
        k, radius = 12, 0.5
        qp, qm = pad_cloud(q, 128)
        sp, sm = pad_cloud(s, 256)
        got = np.asarray(radius_knn(jnp.asarray(qp), jnp.asarray(qm),
                                    jnp.asarray(sp), jnp.asarray(sm), radius, k))
        expected = radius_neighbors_oracle(q.astype(np.float64), s.astype(np.float64),
                                           radius, k)
        for i in range(100):
            got_set = set(got[i][got[i] < 256].tolist())
            exp_set = set(expected[i][expected[i] < 200].tolist())
            # fp32 distance expansion can flip borderline in/out; allow 1 difference
            assert len(got_set ^ exp_set) <= 1, f"row {i}: {got_set} vs {exp_set}"
        # padded queries are all-shadow
        assert np.all(got[100:] == 256)

    def test_closest_first_ordering(self, rng):
        q = np.zeros((1, 3), np.float32)
        s = rng.normal(size=(50, 3)).astype(np.float32)
        qp, qm = pad_cloud(q, 8)
        sp, sm = pad_cloud(s, 64)
        got = np.asarray(radius_knn(jnp.asarray(qp), jnp.asarray(qm),
                                    jnp.asarray(sp), jnp.asarray(sm), 10.0, 5))
        d = np.linalg.norm(s, axis=1)
        np.testing.assert_array_equal(got[0], np.argsort(d, kind='stable')[:5])

    def test_shadow_when_no_neighbors(self):
        q = np.array([[100.0, 100, 100]], np.float32)
        s = np.zeros((10, 3), np.float32)
        qp, qm = pad_cloud(q, 8)
        sp, sm = pad_cloud(s, 16)
        got = np.asarray(radius_knn(jnp.asarray(qp), jnp.asarray(qm),
                                    jnp.asarray(sp), jnp.asarray(sm), 0.5, 4))
        assert np.all(got[0] == 16)

    def test_chunked_equals_unchunked(self, rng):
        q = rng.normal(size=(256, 3)).astype(np.float32)
        s = rng.normal(size=(128, 3)).astype(np.float32)
        qm = np.ones(256, bool)
        sm = np.ones(128, bool)
        a = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(s),
                                  jnp.asarray(sm), 0.7, 8, chunk=64))
        b = np.asarray(radius_knn(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(s),
                                  jnp.asarray(sm), 0.7, 8, chunk=1024))
        np.testing.assert_array_equal(a, b)


class TestPyramid:
    def _cfg(self):
        class Cfg:
            architecture = ['simple', 'resnetb', 'resnetb_strided', 'resnetb',
                            'resnetb', 'resnetb_strided', 'resnetb', 'resnetb']
            first_subsampling_dl = 0.06
            conv_radius = 2.5
            neighborhood_limits = [16, 16, 16]
            level_budgets = [512, 512, 256]
        return Cfg()

    def test_spec_from_config(self):
        spec = PyramidSpec.from_config(self._cfg())
        assert spec.num_levels == 3
        np.testing.assert_allclose(spec.voxel_sizes, [0.06, 0.12, 0.24])
        np.testing.assert_allclose(spec.radii, [0.15, 0.3, 0.6])
        assert spec.budgets == (512, 512, 256)

    def test_build_pyramid_shapes_and_consistency(self, rng):
        spec = PyramidSpec.from_config(self._cfg())
        clouds = [rng.normal(size=(400, 3)).astype(np.float32) * 0.5 for _ in range(2)]
        pts = np.stack([pad_cloud(c, 512)[0] for c in clouds])
        mask = np.stack([pad_cloud(c, 512)[1] for c in clouds])
        meta = build_pyramid(jnp.asarray(pts), jnp.asarray(mask), spec)

        assert len(meta['points']) == 3
        assert meta['points'][1].shape == (2, 512, 3)
        assert meta['neighbors'][0].shape == (2, 512, 16)
        assert meta['pools'][0].shape == (2, 512, 16)
        assert meta['upsamples'] == []

        for b, c in enumerate(clouds):
            # Level-1 points match oracle subsample of the true cloud (as sets)
            expected = voxel_subsample_oracle(c.astype(np.float64), 0.12)
            lvl1_mask = np.asarray(meta['masks'][1][b])
            np.testing.assert_allclose(
                np.sort(np.asarray(meta['points'][1][b])[lvl1_mask], axis=0),
                np.sort(expected, axis=0), atol=1e-5)
            # Neighbor indices at level 0: shadow or valid support rows
            nb = np.asarray(meta['neighbors'][0][b])
            valid_nb = nb[nb < 512]
            assert np.all(np.asarray(meta['masks'][0][b])[valid_nb])
            # Every valid level-0 point should find itself (distance 0)
            row_ids = np.arange(512)[np.asarray(meta['masks'][0][b])]
            assert np.all(nb[row_ids, 0] == row_ids)

    def test_pool_indices_within_radius(self, rng):
        spec = PyramidSpec.from_config(self._cfg())
        c = rng.normal(size=(400, 3)).astype(np.float32) * 0.5
        pts, mask = pad_cloud(c, 512)
        meta = build_pyramid(jnp.asarray(pts[None]), jnp.asarray(mask[None]), spec)
        pools = np.asarray(meta['pools'][0][0])
        lvl0 = np.asarray(meta['points'][0][0])  # Morton-sorted level-0 points
        lvl1 = np.asarray(meta['points'][1][0])
        lvl1_mask = np.asarray(meta['masks'][1][0])
        for i in np.nonzero(lvl1_mask)[0][:50]:
            nbrs = pools[i][pools[i] < 512]
            if len(nbrs):
                d = np.linalg.norm(lvl0[nbrs] - lvl1[i], axis=1)
                assert np.all(d <= 0.15 + 1e-4)

    def test_upsamples_optional(self, rng):
        spec = PyramidSpec.from_config(self._cfg())
        c = rng.normal(size=(100, 3)).astype(np.float32)
        pts, mask = pad_cloud(c, 512)
        meta = build_pyramid(jnp.asarray(pts[None]), jnp.asarray(mask[None]), spec,
                             need_upsamples=True)
        assert len(meta['upsamples']) == 2
        assert meta['upsamples'][0].shape == (1, 512, 16)


class TestNeighborKnobs:
    def test_exact_and_recall_knobs_from_config(self):
        from superpoints_registration_tpu.config import Config
        from superpoints_registration_tpu.ops.pyramid import PyramidSpec
        base = dict(architecture=['simple', 'resnetb_strided', 'resnetb'],
                    first_subsampling_dl=0.05, conv_radius=2.5,
                    neighborhood_limits=[12, 12], level_budgets=[256, 128])
        spec = PyramidSpec.from_config(Config(base))
        assert spec.exact is False and spec.recall == 0.95
        spec2 = PyramidSpec.from_config(Config(dict(base, neighbor_exact=True,
                                                    neighbor_recall=0.9)))
        assert spec2.exact is True and spec2.recall == 0.9

    def test_exact_matches_oracle_small(self, rng):
        import jax.numpy as jnp
        from superpoints_registration_tpu.ops.neighbors import radius_knn
        pts = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
        m = jnp.ones(128, bool)
        a = np.asarray(radius_knn(pts, m, pts, m, 0.5, 8, exact=True))
        b = np.asarray(radius_knn(pts, m, pts, m, 0.5, 8, exact=False,
                                  recall=0.99))
        # On CPU approx_max_k is exact; the bf16 distance copy may flip
        # points within ~0.4% of the radius boundary, so compare on
        # strictly-interior neighbors only.
        p = np.asarray(pts)
        for i in range(128):
            sa, sb = set(a[i].tolist()) - {128}, set(b[i].tolist()) - {128}
            for j in sa ^ sb:   # disagreements must be boundary cases
                d = np.linalg.norm(p[i] - p[j])
                assert abs(d - 0.5) < 0.01, (i, j, d)


class TestBlockedKnn:
    """The blocked (cell-list style) search must equal brute force exactly
    whenever rmax covers the relevant support blocks."""

    def _coherent_cloud(self, rng, n, extent=2.0, cell=0.1):
        pts = rng.uniform(0, extent, (n, 3)).astype(np.float32)
        order = np.lexsort((pts[:, 2] // cell, pts[:, 1] // cell,
                            pts[:, 0] // cell))
        return pts[order]

    def test_matches_brute_exact(self, rng):
        from superpoints_registration_tpu.ops.neighbors import (
            radius_knn, radius_knn_blocked)
        pts = self._coherent_cloud(rng, 1000)
        m = np.ones(1000, bool)
        m[950:] = False  # invalid rows (sorted last, as in the pyramid)
        r, k = 0.25, 16
        a = np.asarray(radius_knn(jnp.asarray(pts), jnp.asarray(m),
                                  jnp.asarray(pts), jnp.asarray(m), r, k,
                                  exact=True))
        b, nrel = radius_knn_blocked(jnp.asarray(pts), jnp.asarray(m),
                                     jnp.asarray(pts), jnp.asarray(m), r, k,
                                     qblock=64, sblock=32, rmax=48)
        b = np.asarray(b)
        assert int(nrel) <= 48  # telemetry: no overflow at this rmax
        for i in range(1000):
            assert set(a[i][a[i] < 1000]) == set(b[i][b[i] < 1000])

    def test_unsorted_input_still_exact_with_full_rmax(self, rng):
        from superpoints_registration_tpu.ops.neighbors import (
            radius_knn, radius_knn_blocked)
        pts = rng.uniform(0, 2, (777, 3)).astype(np.float32)  # NOT sorted
        m = np.ones(777, bool)
        r, k = 0.25, 8
        nsb = -(-777 // 32)
        a = np.asarray(radius_knn(jnp.asarray(pts), jnp.asarray(m),
                                  jnp.asarray(pts), jnp.asarray(m), r, k,
                                  exact=True))
        b, _ = radius_knn_blocked(jnp.asarray(pts), jnp.asarray(m),
                                  jnp.asarray(pts), jnp.asarray(m), r, k,
                                  qblock=64, sblock=32, rmax=nsb)
        b = np.asarray(b)
        for i in range(777):
            assert set(a[i][a[i] < 777]) == set(b[i][b[i] < 777])

    def test_overflow_telemetry_and_nearest_block_degradation(self, rng):
        from superpoints_registration_tpu.ops.neighbors import radius_knn_blocked
        # A radius spanning the whole cloud makes every block relevant.
        pts = self._coherent_cloud(rng, 256, extent=0.3)
        m = np.ones(256, bool)
        idx, nrel = radius_knn_blocked(jnp.asarray(pts), jnp.asarray(m),
                                       jnp.asarray(pts), jnp.asarray(m),
                                       10.0, 8, qblock=64, sblock=32, rmax=2)
        assert int(nrel) == 8  # all 8 support blocks relevant -> overflow
        idx = np.asarray(idx)
        # Degraded result still returns valid in-radius neighbors.
        assert np.all(idx[np.ones(256, bool)] <= 256)
        assert np.all(idx[:, 0] < 256)

    def test_queries_differ_from_supports(self, rng):
        from superpoints_registration_tpu.ops.neighbors import (
            radius_knn, radius_knn_blocked)
        sup = self._coherent_cloud(rng, 512)
        qry = self._coherent_cloud(rng, 192)
        ms, mq = np.ones(512, bool), np.ones(192, bool)
        r, k = 0.3, 12
        a = np.asarray(radius_knn(jnp.asarray(qry), jnp.asarray(mq),
                                  jnp.asarray(sup), jnp.asarray(ms), r, k,
                                  exact=True))
        b, _ = radius_knn_blocked(jnp.asarray(qry), jnp.asarray(mq),
                                  jnp.asarray(sup), jnp.asarray(ms), r, k,
                                  qblock=64, sblock=32, rmax=16)
        b = np.asarray(b)
        for i in range(192):
            assert set(a[i][a[i] < 512]) == set(b[i][b[i] < 512])
