"""Fixed-K radius neighbor search, fully on-device.

Replaces the reference's C++ nanoflann radius search
(src/models/backbone_kpconv/cpp_wrappers/cpp_neighbors/neighbors/
neighbors.cpp:125-333) and its PyTorch3D ball_query GPU path
(src/models/backbone_kpconv/kpconv.py:265-292).

Output convention matches the reference's shadow-neighbor scheme: a (Nq, K)
int32 index matrix where entry == Ns (number of support rows) means "no
neighbor" — consumers gather from support arrays padded with one shadow row
(features = 0, position = 1e6), exactly like kpconv_blocks.py:309,388.

TPU-first design: brute-force squared distances computed as a (chunk, Ns)
matmul on the MXU, then `top_k` for the K nearest within the radius. Unlike
the reference GPU path (ball_query returns an *arbitrary* K neighbors), this
returns the K *closest* — deterministic, and strictly better neighborhoods
when the cap truncates. Queries are processed in chunks under `lax.map` to
bound memory at (chunk x Ns).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Module-level import, NOT lazy: importing a pallas module inside a traced
# function creates device constants mid-trace, which triggers the axon
# runtime's repeated-dispatch fault (root-caused round 2, see
# models/kpconv.py:27-31 and docs/pallas_fault_repro.py).
from .pallas.knn import lane_min_candidates

_LANE128 = 128


@partial(jax.jit, static_argnames=("k", "chunk", "exact", "recall"))
def radius_knn(queries: jnp.ndarray, q_mask: jnp.ndarray,
               supports: jnp.ndarray, s_mask: jnp.ndarray,
               radius, k: int, chunk: int = 1024,
               exact: bool = False, recall: float = 0.95) -> jnp.ndarray:
    """K-nearest neighbors within `radius`, shadow-padded to fixed K.

    Args:
        queries: (Nq, 3) float32 (padded rows arbitrary but finite).
        q_mask: (Nq,) bool.
        supports: (Ns, 3) float32.
        s_mask: (Ns,) bool.
        radius: search radius (scalar, may be traced).
        k: static neighbor cap.
        chunk: static query chunk size (Nq must be a multiple, or <= chunk).
        exact: use exact top_k. Default False: `jax.lax.approx_max_k`, which
            lowers to the TPU PartialReduce unit and is ~55x faster than the
            full-sort top_k at L0 scale (measured: 67 ms vs 3.7 s for
            16 x 16384^2 on v5e) at ~0.95+ recall. Exact on CPU either way.
            A handful of missed neighbors is benign here: KPConv aggregates
            ~40 neighbors, and the reference's own GPU path (ball_query,
            kpconv.py:265-292) keeps an *arbitrary* K subset.

    Returns:
        (Nq, K) int32 indices into supports; == Ns where there is no neighbor.
    """
    nq = queries.shape[0]
    ns = supports.shape[0]

    # Recenter for fp32 accuracy of the |q|^2 - 2qs + |s|^2 expansion.
    denom = jnp.maximum(jnp.sum(s_mask.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(s_mask[:, None], supports, 0.0), axis=0) / denom
    q = jnp.where(q_mask[:, None], queries - center, 0.0).astype(jnp.float32)
    s = jnp.where(s_mask[:, None], supports - center, 0.0).astype(jnp.float32)

    s_sq = jnp.sum(s * s, axis=-1)
    # Invalid supports get a huge (finite) distance: a finite sentinel
    # avoids 0*inf NaN hazards inside the HIGH-precision decomposition.
    s_sq = jnp.where(s_mask, s_sq, jnp.float32(4e9))
    r_sq = jnp.asarray(radius, jnp.float32) ** 2
    # Augmented-matmul distance: [-2q | |q|^2 | 1] @ [s | 1 | |s|^2]^T ==
    # |q-s|^2 straight out of ONE matmul — the expansion's cancellation
    # happens inside the f32 accumulator, the f32 sum/add epilogue of the
    # 3-term form never materializes, and the bf16 cast fuses into the
    # matmul output (measured 41 -> 35 ms at L0 scale on v5e).
    # HIGH (bf16_3x) instead of HIGHEST: the dropped lo*lo term is
    # ~(4e-3 m)^2 = 2e-5 m^2, two orders below r^2 at the finest level,
    # while HIGHEST's extra passes cost ~1.5x of the whole search.
    s_aug = jnp.concatenate(
        [s, jnp.ones((ns, 1), jnp.float32), s_sq[:, None]], axis=-1)

    def process(q_chunk, qm_chunk):
        qq = jnp.sum(q_chunk * q_chunk, axis=-1)
        q_aug = jnp.concatenate(
            [-2.0 * q_chunk, qq[:, None],
             jnp.ones((q_chunk.shape[0], 1), jnp.float32)], axis=-1)
        sqd = jnp.matmul(q_aug, s_aug.T, precision=jax.lax.Precision.HIGH)
        if exact:
            neg_vals, idx = jax.lax.top_k(-sqd, k)
        else:
            # The (chunk, Ns) distance matrix is pure HBM traffic; storing it
            # as bf16 halves it. The bf16 rounding is RELATIVE to the small
            # |q-s|^2 result (cancellation already happened in f32), so
            # selection and the radius test stay boundary-accurate to ~0.2%
            # of r, far below the 0.95 recall_target's own miss rate.
            neg_vals, idx = jax.lax.approx_max_k(
                -sqd.astype(jnp.bfloat16), k, recall_target=recall)
            neg_vals = neg_vals.astype(jnp.float32)
        ok = (-neg_vals <= r_sq) & qm_chunk[:, None]
        return jnp.where(ok, idx, ns).astype(jnp.int32)

    if nq <= chunk:
        return process(q, q_mask)

    # Balance the chunk size: with a fixed chunk, the last chunk's padding is
    # pure wasted distance compute (e.g. 4864 queries at chunk 2048 pads 26%).
    # Shrink the chunk to the smallest 128-multiple that still covers nq in
    # the same number of chunks.
    n_chunks = -(-nq // chunk)
    chunk = -(-(-(-nq // n_chunks)) // 128) * 128
    pad = n_chunks * chunk - nq
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, 3), q.dtype)])
        q_mask = jnp.concatenate([q_mask, jnp.zeros((pad,), bool)])
    out = jax.lax.map(
        lambda t: process(*t),
        (q.reshape(n_chunks, chunk, 3), q_mask.reshape(n_chunks, chunk)))
    return out.reshape(n_chunks * chunk, k)[:nq]


def radius_knn_batch(queries, q_mask, supports, s_mask, radius, k: int,
                     chunk: int = 1024, exact: bool = False,
                     recall: float = 0.95):
    """Batched over clouds: (B, Nq, 3), (B, Nq), (B, Ns, 3), (B, Ns) -> (B, Nq, K)."""
    def fn(q, qm, s, sm):
        return radius_knn(q, qm, s, sm, radius, k, chunk, exact, recall)
    return jax.vmap(fn)(queries, q_mask, supports, s_mask)


# ---------------------------------------------------------------------------
# Blocked (cell-list style) search.
#
# The brute-force path above materializes a (Nq, Ns) distance matrix whose
# HBM write+read is the measured 43 ms floor at L0 scale (docs/PERF.md). The
# reference never brute-forces either: its CPU path is a nanoflann KD-tree
# (cpp_neighbors/neighbors/neighbors.cpp:211) and its GPU path a bucketed
# ball query. This is the TPU-shaped equivalent: a *block-sparse* distance
# computation that exploits the Morton sort already applied by the pyramid.
#
#   * queries/supports are split into contiguous blocks (Morton order makes
#     blocks spatially compact);
#   * per block, an axis-aligned bounding box over the valid points;
#   * a (n_qblocks, n_sblocks) relevance test: a support block can contain a
#     neighbor iff the squared AABB gap <= radius^2 — an exact SUPERSET test;
#   * each query block gathers only its `rmax` nearest relevant support
#     blocks (block gathers: a few thousand wide rows per cloud, not
#     millions of point rows) and computes exact distances against those
#     rmax*sblock candidates on the MXU;
#   * exact top-k over the candidates (hundreds/thousands, not Ns).
#
# Exact by construction whenever every query block has <= rmax relevant
# support blocks; on overflow the *nearest* blocks are kept (graceful
# degradation) and the overflow is reported so calibration can raise rmax.
# ---------------------------------------------------------------------------


def _block_aabb(pts, mask, nblocks, bs):
    """Per-block AABB over valid points. Returns (min, max) of (nblocks, 3);
    fully-invalid blocks get (+inf, -inf) so their gap to anything is +inf."""
    p = pts.reshape(nblocks, bs, 3)
    m = mask.reshape(nblocks, bs, 1)
    lo = jnp.min(jnp.where(m, p, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(m, p, -jnp.inf), axis=1)
    return lo, hi


def _blocked_prep(queries, q_mask, supports, s_mask, radius,
                  qblock: int, sblock: int):
    """Shared phase 1: pad, recenter, per-block AABBs, relevance matrix."""
    nq, ns = queries.shape[0], supports.shape[0]
    qpad = -nq % qblock
    spad = -ns % sblock
    if qpad:
        queries = jnp.concatenate([queries, jnp.zeros((qpad, 3), queries.dtype)])
        q_mask = jnp.concatenate([q_mask, jnp.zeros((qpad,), bool)])
    if spad:
        supports = jnp.concatenate([supports, jnp.zeros((spad, 3), supports.dtype)])
        s_mask = jnp.concatenate([s_mask, jnp.zeros((spad,), bool)])
    nqb = queries.shape[0] // qblock
    nsb = supports.shape[0] // sblock

    # Recenter for fp32 accuracy of the |q|^2 - 2qs + |s|^2 expansion.
    denom = jnp.maximum(jnp.sum(s_mask.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(s_mask[:, None], supports, 0.0), axis=0) / denom
    q = jnp.where(q_mask[:, None], queries - center, 0.0).astype(jnp.float32)
    # Invalid supports go to a far shadow position: they fail the radius test
    # in the exact distance pass with no extra mask traffic.
    s = jnp.where(s_mask[:, None], supports - center, 1e6).astype(jnp.float32)
    r_sq = jnp.asarray(radius, jnp.float32) ** 2

    qlo, qhi = _block_aabb(q, q_mask, nqb, qblock)
    slo, shi = _block_aabb(s, s_mask, nsb, sblock)

    # Exact superset test: squared gap between AABBs <= r^2.
    gap = jnp.maximum(0.0, jnp.maximum(slo[None] - qhi[:, None],
                                       qlo[:, None] - shi[None]))
    gap = jnp.where(jnp.isfinite(gap), gap, jnp.inf)  # empty-block guard
    relevant = jnp.sum(gap * gap, axis=-1) <= r_sq            # (nqb, nsb)
    centers = (jnp.where(jnp.isfinite(qlo), 0.5 * (qlo + qhi), 0.0),
               jnp.where(jnp.isfinite(slo), 0.5 * (slo + shi), 1e6))
    return q, q_mask, s, relevant, centers, r_sq, nqb, nsb


@partial(jax.jit, static_argnames=("qblock", "sblock"))
def blocked_relevance_counts(queries, q_mask, supports, s_mask, radius,
                             qblock: int = 128, sblock: int = 64):
    """Per-query-block count of relevant support blocks — the cheap
    calibration probe for `rmax` (no distance matrix is built)."""
    _, _, _, relevant, _, _, _, _ = _blocked_prep(
        queries, q_mask, supports, s_mask, radius, qblock, sblock)
    return jnp.sum(relevant.astype(jnp.int32), axis=1)


@partial(jax.jit, static_argnames=("k", "qblock", "sblock", "rmax", "exact",
                                   "recall", "group"))
def radius_knn_blocked(queries: jnp.ndarray, q_mask: jnp.ndarray,
                       supports: jnp.ndarray, s_mask: jnp.ndarray,
                       radius, k: int, qblock: int = 128, sblock: int = 64,
                       rmax: int = 32, exact: bool = True,
                       recall: float = 0.95, group: int = 16):
    """Blocked K-nearest-within-radius; same contract as `radius_knn`.

    Args:
        queries/supports: (Nq, 3) / (Ns, 3) float32, MORTON-SORTED (or at
            least spatially-coherent) with invalid rows last. Correct for any
            ordering, but fast (low rmax overflow) only for a sorted one.
        qblock/sblock: static block sizes (Nq/Ns padded up internally).
        rmax: static max relevant support blocks per query block.
        exact: exact `top_k` over candidates (cheap: rmax*sblock of them).
        group: query blocks processed per `lax.map` step — bounds the live
            (group*qblock, rmax*sblock) distance tile so exact f32 top_k
            never materializes an Nq-scale sort buffer.

    Returns:
        (idx, n_rel_max): (Nq, K) int32 shadow-padded indices, and the
        scalar max relevant-block count over query blocks — if this exceeds
        rmax the result is (slightly) approximate and rmax should be raised.
    """
    nq, ns = queries.shape[0], supports.shape[0]
    q, q_mask, s, relevant, (qc, sc), r_sq, nqb, nsb = _blocked_prep(
        queries, q_mask, supports, s_mask, radius, qblock, sblock)
    n_rel_max = jnp.max(jnp.sum(relevant.astype(jnp.int32), axis=1))

    # Keep the rmax NEAREST relevant blocks (by AABB-center distance) so an
    # overflow degrades to dropping the farthest candidates.
    cdist = jnp.sum((qc[:, None] - sc[None]) ** 2, axis=-1)
    score = jnp.where(relevant, -cdist, -jnp.inf)
    blk_score, rel_idx = jax.lax.top_k(score, min(rmax, nsb))  # (nqb, rmax)
    rmax_eff = rel_idx.shape[1]
    slot_ok = jnp.isfinite(blk_score)
    s_tab = s.reshape(nsb, sblock * 3)
    qb_all = q.reshape(nqb, qblock, 3)
    qm_all = q_mask.reshape(nqb, qblock)

    def process(args):
        qb, qm, ridx, rok = args                # (g,Q,3) (g,Q) (g,R) (g,R)
        g = qb.shape[0]
        # Block gather: g*rmax wide rows instead of per-point rows.
        cand = s_tab.at[ridx.reshape(-1)].get(
            mode='promise_in_bounds')  # top_k idx: in-bounds
        cand = cand.reshape(g, rmax_eff, sblock, 3)
        cand = jnp.where(rok[..., None, None], cand, 1e6)  # dead slot -> far
        cand = cand.reshape(g, rmax_eff * sblock, 3)
        # HIGH (bf16_3x) precision: see radius_knn — f32-grade for |q-s|^2
        # at these scales. (A direct elementwise |q-c|^2 was measured ~2x
        # SLOWER here: the (g, Q, C, 3) intermediate materializes.)
        dots = jnp.einsum('gic,gjc->gij', qb, cand,
                          precision=jax.lax.Precision.HIGH)
        qq = jnp.sum(qb * qb, axis=-1)
        ss = jnp.sum(cand * cand, axis=-1)
        sqd = qq[..., None] - 2.0 * dots + ss[:, None, :]    # (g, Q, C)
        if exact:
            neg_vals, topi = jax.lax.top_k(-sqd, k)
        else:
            neg_vals, topi = jax.lax.approx_max_k(
                -sqd.astype(jnp.bfloat16), k, recall_target=recall)
            neg_vals = neg_vals.astype(jnp.float32)
        # Map candidate-axis positions to global support indices WITHOUT a
        # gather (a vmapped fancy-index here measured 94 ms at L0 scale —
        # 4x the rest of the search combined): candidate j sits at offset
        # j % sblock of relevant block j // sblock, and the block-id lookup
        # is a tiny one-hot contraction over rmax, fully VPU-vectorized.
        blk_pos = topi // sblock                           # (g, Q, k)
        onehot = (blk_pos[..., None] ==
                  jnp.arange(rmax_eff, dtype=jnp.int32))   # (g, Q, k, R)
        sel_blk = jnp.sum(onehot * ridx[:, None, None, :], axis=-1)
        idx = sel_blk * sblock + topi % sblock
        ok = (-neg_vals <= r_sq) & qm[..., None]
        # Padded-support indices (from spad) point past ns; shadow them too.
        ok &= idx < ns
        return jnp.where(ok, idx, ns).astype(jnp.int32)

    g = min(group, nqb)
    if nqb % g:
        g = 1
    if g == nqb:
        idx = process((qb_all, qm_all, rel_idx, slot_ok))
    else:
        idx = jax.lax.map(process,
                          (qb_all.reshape(nqb // g, g, qblock, 3),
                           qm_all.reshape(nqb // g, g, qblock),
                           rel_idx.reshape(nqb // g, g, rmax_eff),
                           slot_ok.reshape(nqb // g, g, rmax_eff)))
        idx = idx.reshape(nqb, qblock, k)
    return idx.reshape(nqb * qblock, k)[:nq], n_rel_max


def radius_knn_blocked_batch(queries, q_mask, supports, s_mask, radius,
                             k: int, qblock: int = 128, sblock: int = 64,
                             rmax: int = 32, exact: bool = True,
                             recall: float = 0.95):
    """Batched blocked search: (B, Nq, 3) ... -> ((B, Nq, K), (B,) n_rel_max)."""
    def fn(q, qm, s, sm):
        return radius_knn_blocked(q, qm, s, sm, radius, k, qblock, sblock,
                                  rmax, exact, recall)
    return jax.vmap(fn)(queries, q_mask, supports, s_mask)


# ---------------------------------------------------------------------------
# Fused lane-min search (pallas): never materializes the (Nq, Ns) distance
# matrix. See ops/pallas/knn.py for the kernel and the recall argument.
# ---------------------------------------------------------------------------


def radius_knn_lane_batch(queries, q_mask, supports, s_mask, radius, k: int,
                          cpl: int = 2, bq: int = 256, bs: int = 2048,
                          exact: bool = True, recall: float = 0.95,
                          interpret: bool | None = None,
                          packed: bool = False):
    """Batched fused-kernel search; same contract as `radius_knn_batch`.

    The pallas kernel reduces the distance matrix to cpl*128 candidates per
    query on the fly (running minima per support-column lane residue), so
    only (B, Nq, cpl*128) values+indices ever reach HBM. The final
    K-nearest-within-radius selection runs over those candidates.

    Near-exact for Morton-sorted supports (a query's true neighbors occupy
    few contiguous column runs; a run of m <= 128 columns collides in no
    residue) — and strictly better than the reference GPU ball_query's
    arbitrary-K subset (kpconv.py:265-292). Exact whenever Ns <= cpl*128.

    Args:
        queries: (B, Nq, 3) f32. q_mask: (B, Nq) bool.
        supports: (B, Ns, 3) f32. s_mask: (B, Ns) bool.
        cpl: candidates kept per lane residue (1 or 2).
        exact: exact top_k over the cpl*128 candidates (cheap) instead of
            approx_max_k.
        interpret: pallas interpret mode; default auto (CPU backend -> True).

    Returns:
        (B, Nq, K) int32 indices into supports; == Ns where no neighbor.
    """
    if interpret is None:
        interpret = jax.default_backend() == 'cpu'
    b, nq, _ = queries.shape
    ns = supports.shape[1]

    # Recenter per cloud for fp32 accuracy of the expansion.
    denom = jnp.maximum(jnp.sum(s_mask.astype(jnp.float32), axis=1), 1.0)
    center = (jnp.sum(jnp.where(s_mask[..., None], supports, 0.0), axis=1)
              / denom[:, None])                               # (B, 3)
    q = jnp.where(q_mask[..., None], queries - center[:, None], 0.0)
    q = q.astype(jnp.float32)
    s = jnp.where(s_mask[..., None], supports - center[:, None], 0.0)
    s = s.astype(jnp.float32)
    s_sq = jnp.sum(s * s, axis=-1)
    # Invalid supports carry a huge finite |s|^2 so their distance exceeds
    # any radius (same sentinel as radius_knn above).
    s_sq = jnp.where(s_mask, s_sq, jnp.float32(4e9))
    r_sq = jnp.asarray(radius, jnp.float32) ** 2

    qq = jnp.sum(q * q, axis=-1)
    ones_q = jnp.ones((b, nq, 1), jnp.float32)
    q_aug = jnp.concatenate(
        [-2.0 * q, qq[..., None], ones_q, jnp.zeros((b, nq, 3), jnp.float32)],
        axis=-1)                                              # (B, Nq, 8)
    s_aug_t = jnp.stack(
        [s[..., 0], s[..., 1], s[..., 2], jnp.ones((b, ns), jnp.float32),
         s_sq, jnp.zeros((b, ns), jnp.float32),
         jnp.zeros((b, ns), jnp.float32), jnp.zeros((b, ns), jnp.float32)],
        axis=1)                                               # (B, 8, Ns)

    # Pad Nq / Ns up to block multiples. Padded support columns must look
    # invalid: [0,0,0 | 1 | 4e9 | 0,0,0] -> distance ~4e9, fails the radius
    # test (an all-zero pad column would read as distance 0 == perfect hit).
    bq = min(bq, -(-nq // 8) * 8)
    bs = min(bs, -(-ns // _LANE128) * _LANE128)
    qpad = -nq % bq
    spad = -ns % bs
    if qpad:
        q_aug = jnp.concatenate(
            [q_aug, jnp.zeros((b, qpad, 8), jnp.float32)], axis=1)
    if spad:
        pad_col = jnp.zeros((b, 8, spad), jnp.float32)
        pad_col = pad_col.at[:, 3].set(1.0).at[:, 4].set(4e9)
        s_aug_t = jnp.concatenate([s_aug_t, pad_col], axis=2)

    if packed:
        # Packed-key kernel + key-domain selection (docs/PERF.md round-4):
        # k-of-256 on the PartialReduce unit straight over the monotone
        # int32 keys — no unpack of losers, no sort, no gather.
        from .pallas.knn import (lane_min_keys_packed, packed_code_bits,
                                 select_k_packed)
        keys = lane_min_keys_packed(q_aug, s_aug_t, bq=bq, bs=bs,
                                    cpl=cpl, interpret=interpret)
        vals, idx = select_k_packed(keys[:, :nq],
                                    k, packed_code_bits(s_aug_t.shape[2]),
                                    cpl, exact=exact, recall=recall)
        ok = (vals <= r_sq) & q_mask[..., None] & (idx < ns)
        return jnp.where(ok, idx, ns).astype(jnp.int32)

    vals, cols = lane_min_candidates(q_aug, s_aug_t, bq=bq, bs=bs,
                                     cpl=cpl, interpret=interpret)
    vals, cols = vals[:, :nq], cols[:, :nq]

    if exact:
        neg_vals, pos = jax.lax.top_k(-vals, k)
    else:
        neg_vals, pos = jax.lax.approx_max_k(
            -vals.astype(jnp.bfloat16), k, recall_target=recall)
        neg_vals = neg_vals.astype(jnp.float32)
    idx = jnp.take_along_axis(cols, pos, axis=-1)
    ok = (-neg_vals <= r_sq) & q_mask[..., None] & (idx < ns)
    return jnp.where(ok, idx, ns).astype(jnp.int32)
