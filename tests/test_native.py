"""Native C++ host ops: build + oracle parity."""
import pathlib
import subprocess

import numpy as np
import pytest

from oracle_np import radius_neighbors_oracle, voxel_subsample_oracle

REPO = pathlib.Path(__file__).parent.parent


@pytest.fixture(scope='session')
def native():
    lib = REPO / 'cpp' / 'libspr_native.so'
    if not lib.exists():
        subprocess.run([str(REPO / 'cpp' / 'build.sh')], check=True)
    from superpoints_registration_tpu import native as native_mod
    assert native_mod.available()
    return native_mod


class TestNativeOps:
    def test_grid_subsample_matches_oracle(self, native, rng):
        pts = rng.normal(size=(2000, 3)).astype(np.float32)
        got = native.grid_subsample(pts, 0.25)
        exp = voxel_subsample_oracle(pts.astype(np.float64), 0.25)
        assert len(got) == len(exp)
        np.testing.assert_allclose(np.sort(got, axis=0), np.sort(exp, axis=0),
                                   atol=1e-4)

    def test_radius_neighbors_matches_oracle(self, native, rng):
        q = rng.normal(size=(100, 3)).astype(np.float32)
        s = rng.normal(size=(500, 3)).astype(np.float32)
        got = native.radius_neighbors(q, s, 0.4, 10)
        exp = radius_neighbors_oracle(q.astype(np.float64), s.astype(np.float64),
                                      0.4, 10)
        for i in range(100):
            assert set(got[i][got[i] < 500]) == set(exp[i][exp[i] < 500])

    def test_voxel_downsample_first(self, native, rng):
        pts = rng.normal(size=(3000, 3)).astype(np.float32)
        out = native.voxel_downsample_first(pts, 0.3)
        coords = np.floor(out / 0.3).astype(np.int64)
        assert len(np.unique(coords, axis=0)) == len(out)

    def test_mutual_overlap(self, native, rng):
        src = rng.normal(size=(300, 3)).astype(np.float32)
        tgt = np.concatenate([src[:100] + 0.001,
                              rng.normal(size=(50, 3)) + 50]).astype(np.float32)
        sm, tm = native.mutual_overlap(src, tgt, 0.05)
        assert sm[:100].all() and not sm[100:].any()
        assert tm[:100].all() and not tm[100:].any()
