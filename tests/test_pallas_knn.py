"""Tests for the fused lane-min neighbor search (ops/pallas/knn.py).

Runs the pallas kernel in interpret mode on CPU; correctness is judged
against the exact brute-force search (ops/neighbors.py:radius_knn_batch).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from superpoints_registration_tpu.ops.morton import morton_keys
from superpoints_registration_tpu.ops.neighbors import (
    radius_knn_batch, radius_knn_lane_batch)
from superpoints_registration_tpu.ops.pallas.knn import lane_min_candidates


def _morton_order(pts, mask, voxel=0.025):
    """Sort order: Morton keys at `voxel` scale, invalid rows last."""
    coords = np.floor((pts - pts.min(0)) / voxel).astype(np.int32)
    hi, lo = morton_keys(jnp.asarray(coords))
    key = (np.asarray(hi).astype(np.int64) << 31) | np.asarray(lo)
    key[~mask] = np.iinfo(np.int64).max
    return np.argsort(key, kind='stable')


def _make_clouds(rng, b, nq, ns, extent=3.0, sort=True):
    """Morton-sorted random clouds with a few invalid tail rows."""
    s = rng.uniform(0, extent, size=(b, ns, 3)).astype(np.float32)
    q = s[:, rng.integers(0, ns, size=nq)] + \
        rng.normal(0, 0.02, size=(b, nq, 3)).astype(np.float32)
    q = q.astype(np.float32)
    sm = np.ones((b, ns), bool)
    qm = np.ones((b, nq), bool)
    sm[:, ns - ns // 10:] = False
    qm[:, nq - nq // 13:] = False
    if sort:
        for i in range(b):
            order = _morton_order(s[i], sm[i])
            s[i], sm[i] = s[i][order], sm[i][order]
            order = _morton_order(q[i], qm[i])
            q[i], qm[i] = q[i][order], qm[i][order]
    return (jnp.asarray(q), jnp.asarray(qm), jnp.asarray(s), jnp.asarray(sm))


def _recall(idx_lane, idx_exact, ns):
    """Fraction of exact neighbors recovered by the lane search."""
    hit = tot = 0
    a = np.asarray(idx_lane)
    b = np.asarray(idx_exact)
    for bi in range(a.shape[0]):
        for qi in range(a.shape[1]):
            ex = set(b[bi, qi][b[bi, qi] < ns].tolist())
            got = set(a[bi, qi][a[bi, qi] < ns].tolist())
            tot += len(ex)
            hit += len(ex & got)
    return hit / max(tot, 1)


def test_lane_min_candidates_small_exact():
    """Ns <= 128: every support column has a distinct lane residue, so the
    candidate set IS the full column set — kernel must be exact."""
    rng = np.random.default_rng(0)
    b, nq, ns = 2, 64, 128
    q = rng.normal(size=(b, nq, 3)).astype(np.float32)
    s = rng.normal(size=(b, ns, 3)).astype(np.float32)
    qq = np.sum(q * q, axis=-1)
    ss = np.sum(s * s, axis=-1)
    q_aug = np.concatenate(
        [-2 * q, qq[..., None], np.ones((b, nq, 1), np.float32),
         np.zeros((b, nq, 3), np.float32)], axis=-1)
    s_aug_t = np.stack(
        [s[..., 0], s[..., 1], s[..., 2], np.ones((b, ns), np.float32),
         ss, np.zeros((b, ns), np.float32), np.zeros((b, ns), np.float32),
         np.zeros((b, ns), np.float32)], axis=1)
    vals, cols = lane_min_candidates(
        jnp.asarray(q_aug), jnp.asarray(s_aug_t), bq=32, bs=128, cpl=1,
        interpret=True)
    want = (qq[..., None] - 2 * np.einsum('bqc,bsc->bqs', q, s)
            + ss[:, None, :])
    np.testing.assert_allclose(np.asarray(vals), want, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(cols), np.broadcast_to(np.arange(ns), (b, nq, ns)))


def test_lane_min_cpl2_keeps_two_smallest_per_residue():
    """With several support tiles, slot 2 must hold the true second-smallest
    of each residue class (the running two-min update is order-correct)."""
    rng = np.random.default_rng(1)
    b, nq, ns = 1, 16, 512  # 4 tiles of 128
    q = rng.normal(size=(b, nq, 3)).astype(np.float32)
    s = rng.normal(size=(b, ns, 3)).astype(np.float32)
    qq = np.sum(q * q, axis=-1)
    ss = np.sum(s * s, axis=-1)
    q_aug = np.concatenate(
        [-2 * q, qq[..., None], np.ones((b, nq, 1), np.float32),
         np.zeros((b, nq, 3), np.float32)], axis=-1)
    s_aug_t = np.stack(
        [s[..., 0], s[..., 1], s[..., 2], np.ones((b, ns), np.float32),
         ss, np.zeros((b, ns), np.float32), np.zeros((b, ns), np.float32),
         np.zeros((b, ns), np.float32)], axis=1)
    vals, cols = lane_min_candidates(
        jnp.asarray(q_aug), jnp.asarray(s_aug_t), bq=16, bs=128, cpl=2,
        interpret=True)
    d = (qq[..., None] - 2 * np.einsum('bqc,bsc->bqs', q, s)
         + ss[:, None, :])                       # (1, nq, ns)
    dr = d.reshape(nq, 4, 128)                    # residue-major view
    two = np.sort(dr, axis=1)[:, :2]              # (nq, 2, 128)
    got = np.asarray(vals)[0].reshape(nq, 2, 128)
    got = np.sort(got, axis=1)
    np.testing.assert_allclose(got, np.transpose(two, (0, 1, 2)), atol=1e-4)
    # Columns must agree with the values they claim.
    v, c = np.asarray(vals)[0], np.asarray(cols)[0]
    np.testing.assert_allclose(v, d[0][np.arange(nq)[:, None], c], atol=1e-4)


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("cpl,min_recall", [(1, 0.85), (2, 0.95)])
def test_radius_knn_lane_recall_morton(cpl, min_recall, packed):
    """End-to-end: on Morton-sorted clouds the lane search recovers nearly
    all exact neighbors; shadow convention and masks match the brute path."""
    rng = np.random.default_rng(2)
    q, qm, s, sm = _make_clouds(rng, b=2, nq=384, ns=1024)
    radius, k = 0.25, 16
    exact = radius_knn_batch(q, qm, s, sm, radius, k, exact=True)
    lane = radius_knn_lane_batch(q, qm, s, sm, radius, k, cpl=cpl,
                                 bq=128, bs=256, interpret=True,
                                 packed=packed)
    ns = s.shape[1]
    assert lane.shape == exact.shape
    # Invalid queries -> all shadow.
    assert np.all(np.asarray(lane)[~np.asarray(qm)] == ns)
    # No invalid support ever returned.
    ret = np.asarray(lane)
    sm_np = np.asarray(sm)
    for bi in range(ret.shape[0]):
        got = ret[bi][ret[bi] < ns]
        assert np.all(sm_np[bi][got])
    r = _recall(lane, exact, ns)
    assert r >= min_recall, f"recall {r:.3f} < {min_recall} (cpl={cpl})"


@pytest.mark.parametrize("packed", [False, True])
def test_radius_knn_lane_padding_and_tiny(packed):
    """Non-multiple Nq/Ns exercise the padding path; padded support columns
    must never be returned as neighbors (sentinel distance)."""
    rng = np.random.default_rng(3)
    q, qm, s, sm = _make_clouds(rng, b=1, nq=200, ns=300)
    radius, k = 0.3, 8
    lane = radius_knn_lane_batch(q, qm, s, sm, radius, k, cpl=2,
                                 bq=64, bs=128, interpret=True,
                                 packed=packed)
    exact = radius_knn_batch(q, qm, s, sm, radius, k, exact=True)
    ns = s.shape[1]
    ret = np.asarray(lane)
    assert ret.shape == (1, 200, 8)
    assert ret.max() <= ns
    # ns=300 <= cpl*128 + 128... not fully exact, but recall must be high.
    assert _recall(lane, exact, ns) >= 0.9


@pytest.mark.parametrize("packed", [False, True])
def test_radius_knn_lane_exact_when_ns_fits(packed):
    """Ns <= cpl*128 -> the candidate set contains every support column, so
    the result must EQUAL the exact brute search (as sets per query).
    (For the packed kernel the two tiles of 128 feed slots by tile parity,
    so coverage is complete there too.)"""
    rng = np.random.default_rng(4)
    q, qm, s, sm = _make_clouds(rng, b=2, nq=96, ns=256, sort=False)
    radius, k = 0.4, 8
    lane = radius_knn_lane_batch(q, qm, s, sm, radius, k, cpl=2,
                                 bq=32, bs=128, interpret=True,
                                 packed=packed)
    exact = radius_knn_batch(q, qm, s, sm, radius, k, exact=True)
    ns = s.shape[1]
    a, b_ = np.asarray(lane), np.asarray(exact)
    for bi in range(2):
        for qi in range(96):
            assert (set(a[bi, qi][a[bi, qi] < ns].tolist())
                    == set(b_[bi, qi][b_[bi, qi] < ns].tolist()))


def test_lane_search_under_sharded_mesh():
    """The pallas kernel must compose with a data-parallel mesh (pjit with
    batch-sharded inputs) — guards the dryrun_multichip/training path if
    lane ever becomes a training-time default."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ('dp',))
    rng = np.random.default_rng(6)
    b, nq, ns = 8, 128, 256
    q = jnp.asarray(rng.normal(size=(b, nq, 3)).astype(np.float32))
    qm = jnp.ones((b, nq), bool)
    s = jnp.asarray(rng.normal(size=(b, ns, 3)).astype(np.float32))
    sm = jnp.ones((b, ns), bool)
    sh = NamedSharding(mesh, P('dp'))
    args = tuple(jax.device_put(x, sh) for x in (q, qm, s, sm))
    f = jax.jit(lambda *a: radius_knn_lane_batch(*a, 0.5, 8, bq=64, bs=128,
                                                 interpret=True),
                in_shardings=(sh,) * 4)
    out = f(*args)
    ref = radius_knn_lane_batch(q, qm, s, sm, 0.5, 8, bq=64, bs=128,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pyramid_lane_matches_brute():
    """build_pyramid with neighbor_search=lane produces neighborhoods whose
    overlap with the brute pyramid is near-total (same budgets/masks)."""
    from superpoints_registration_tpu.ops.pyramid import (PyramidSpec,
                                                          build_pyramid)
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 3, size=(2, 1024, 3)).astype(np.float32)
    mask = np.ones((2, 1024), bool)
    mask[:, 960:] = False
    spec_kw = dict(num_levels=2, voxel_sizes=(0.025, 0.05),
                   radii=(0.0625, 0.125), neighbor_limits=(16, 16),
                   budgets=(1024, 512), exact=True)
    brute = build_pyramid(jnp.asarray(pts), jnp.asarray(mask),
                          PyramidSpec(**spec_kw, search='brute'))
    lane = build_pyramid(jnp.asarray(pts), jnp.asarray(mask),
                         PyramidSpec(**spec_kw, search='lane',
                                     min_blocked_n=256))
    for key in ('neighbors', 'pools'):
        for a, b in zip(lane[key], brute[key]):
            a, b = np.asarray(a), np.asarray(b)
            ns = int(b.max())  # shadow id == Ns of that level
            same = hit = 0
            for bi in range(a.shape[0]):
                for qi in range(a.shape[1]):
                    ex = set(b[bi, qi][b[bi, qi] < ns].tolist())
                    got = set(a[bi, qi][a[bi, qi] < ns].tolist())
                    same += len(ex)
                    hit += len(ex & got)
            assert hit / max(same, 1) >= 0.97, (key, hit / max(same, 1))


@pytest.mark.parametrize("exact_sel", [False, True])
def test_packed_key_select_all_invalid_supports(exact_sel):
    """All-invalid supports leave every packed key at its sentinel; the
    key-domain selection (select_k_packed, bitcast-f32 approx_max_k) must
    stay NaN-free (sentinel is the max FINITE float pattern) and return
    all-shadow output."""
    rng = np.random.default_rng(5)
    q, qm, s, _ = _make_clouds(rng, b=1, nq=128, ns=256, sort=False)
    sm = jnp.zeros(s.shape[:2], bool)
    out = radius_knn_lane_batch(q, qm, s, sm, 0.3, 8, cpl=2, bq=64, bs=128,
                                interpret=True, packed=True,
                                exact=exact_sel)
    assert np.all(np.asarray(out) == s.shape[1])


def test_packed_approx_select_matches_exact_select():
    """exact=False routes through approx_max_k on bitcast keys; on CPU the
    PartialReduce fallback is exact, so both selections must agree as sets
    (guards the monotone-bitcast + arithmetic column unpack plumbing)."""
    rng = np.random.default_rng(6)
    q, qm, s, sm = _make_clouds(rng, b=2, nq=256, ns=512)
    a = radius_knn_lane_batch(q, qm, s, sm, 0.25, 12, cpl=2, bq=64, bs=128,
                              interpret=True, packed=True, exact=False)
    b = radius_knn_lane_batch(q, qm, s, sm, 0.25, 12, cpl=2, bq=64, bs=128,
                              interpret=True, packed=True, exact=True)
    ns = s.shape[1]
    a, b = np.asarray(a), np.asarray(b)
    for bi in range(a.shape[0]):
        for qi in range(a.shape[1]):
            assert (set(a[bi, qi][a[bi, qi] < ns].tolist())
                    == set(b[bi, qi][b[bi, qi] < ns].tolist()))
