"""Fused distance + candidate-selection kernel: the "never materialize the
distance matrix" neighbor search.

The brute-force search (ops/neighbors.py:radius_knn) is HBM-bound: the
(Nq, Ns) squared-distance matrix (8.6 GB per 16-cloud L0 batch as bf16) is
written by the matmul and re-read by approx_max_k's PartialReduce —
measured 35 ms at L0 scale on v5e, 60% of that materialization roofline
(docs/PERF.md). The actual information needed downstream is K~25 indices
per query; the matrix is pure traffic.

This kernel fuses the augmented-matmul distance computation
([-2q | |q|^2 | 1] @ [s | 1 | |s|^2]^T, see neighbors.py:68) with an
on-the-fly reduction that needs NO in-kernel sort, top-k, or scatter — the
primitives Mosaic does not expose (docs/PERF.md "Dead ends"). Instead it
keeps, for every query, the running minimum distance (and its column) in
each of 128 *lane residue classes* (support column mod 128, `cpl` deep):
a pure elementwise min/select update on the VPU. Only the (Nq, cpl*128)
candidate values + indices ever reach HBM — ~64x less traffic than the
full matrix — and the exact K-nearest-within-candidates selection runs in
XLA over cpl*128 columns instead of 16,384.

Why lane residues recall the true neighbors: the pyramid stores points in
Morton (voxel-sorted) order, so a query's true K-nearest live in a handful
of short contiguous column runs. A contiguous run of m <= 128 columns
occupies m DISTINCT residues (col mod 128 is injective on any 128-window),
so collisions only happen *across* runs that align mod 128 — rare, and
`cpl=2` (keep the best two per residue) absorbs almost all of them.
This mirrors the reference's own tolerance: its GPU ball query keeps an
arbitrary K-subset of in-radius neighbors (kpconv.py:265-292), while this
keeps the near-exact K closest.

Numerical notes: distances are computed by a HIGHEST-precision (full-f32)
matmul — Mosaic rejects Precision.HIGH at lowering on real TPUs (see
docs/PERF.md), so this kernel runs full f32 while the brute path
(neighbors.py:92) stays HIGH (bf16_3x). Near-radius ties may therefore
resolve differently than brute; the augmented dot is only 8-deep, so the
f32 passes are noise next to the HBM traffic either way. Invalid
support rows carry a 4e9 |s|^2 sentinel so their distances exceed any
radius (neighbors.py:66); the radius test downstream drops them.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANE = 128
_BIG = np.float32(4e9)


def _lane_min_kernel(q_ref, s_ref, val_ref, idx_ref, *, n_slices: int,
                     cpl: int):
    """Grid (B, n_qblocks, n_stiles); last axis iterates sequentially and
    accumulates the per-residue running minima into the output refs."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        val_ref[...] = jnp.full(val_ref.shape, _BIG, val_ref.dtype)
        idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    q = q_ref[0]                       # (BQ, 8)  f32
    s = s_ref[0]                       # (8, BS)  f32
    # HIGHEST, not HIGH: Mosaic's dot lowering rejects HIGH on real TPUs
    # (pallas/mosaic/lowering.py raises "Unsupported dot precision"); the
    # contraction is only 8 deep so full-f32 passes are free — the kernel
    # is VMEM/HBM-traffic-bound, not MXU-bound. Interpret-mode (CPU) tests
    # accept either.
    d = jax.lax.dot_general(
        q, s, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)        # (BQ, BS)

    v1 = val_ref[0, :, :_LANE]
    i1 = idx_ref[0, :, :_LANE]
    if cpl == 2:
        v2 = val_ref[0, :, _LANE:]
        i2 = idx_ref[0, :, _LANE:]
    for u in range(n_slices):
        chunk = d[:, u * _LANE:(u + 1) * _LANE]    # (BQ, 128)
        tile_id = (t * n_slices + u).astype(jnp.int32)
        b1 = chunk < v1
        if cpl == 2:
            # The displaced value (old best, or the newcomer if it lost)
            # then challenges the second slot: a correct running two-min.
            disp_v = jnp.where(b1, v1, chunk)
            disp_i = jnp.where(b1, i1, tile_id)
            b2 = disp_v < v2
            v2 = jnp.where(b2, disp_v, v2)
            i2 = jnp.where(b2, disp_i, i2)
        v1 = jnp.where(b1, chunk, v1)
        i1 = jnp.where(b1, tile_id, i1)
    val_ref[0, :, :_LANE] = v1
    idx_ref[0, :, :_LANE] = i1
    if cpl == 2:
        val_ref[0, :, _LANE:] = v2
        idx_ref[0, :, _LANE:] = i2


def _lane_min_packed_kernel(q_ref, s_ref, key_ref, *, n_slices: int,
                            cpl: int, code_bits: int):
    """Packed-key revision of _lane_min_kernel (docs/PERF.md round-3 verdict:
    the unrolled compare/select chain was VPU-bound at ~8 ops/element).

    One monotone int32 key carries (distance bits | global tile code): for
    d >= 0 the IEEE-754 pattern is order-preserving, so clearing the low
    `code_bits` mantissa bits (<= 2^-15 relative rounding) and OR-ing in the
    scalar tile code makes min() select by distance AND remember where the
    winner came from. The round-4 on-chip measurement (kernels/bench_knn.py)
    showed the ~3-vs-8-ops argument alone moved nothing (201 vs 204 ms):
    the unrolled per-slice Python loop itself was the pathology. This
    version instead (a) ORs a broadcast iota-derived code over the whole
    (BQ, BS) tile at once and reduces with ONE reshape-min over the slice
    axis (measured 67 ms vs 201), and (b) replaces the HIGHEST-precision
    f32 dot (Mosaic rejects HIGH in-kernel) with a manual bf16_3x
    decomposition — hi/lo bf16 splits, three MXU passes accumulated in f32,
    exactly Precision.HIGH's algorithm and exactly the brute path's math
    (neighbors.py:92) — measured 40 ms for the DEFAULT-precision dot vs
    67 ms HIGHEST at this tile shape.

    cpl=2 keeps two independent minima per residue fed by tile PARITY
    (even tiles -> slot 0, odd -> slot 1) instead of a true running
    two-best — collisions within one parity class lose their runner-up;
    the recall tests and the ablation gate (docs/ABLATION.md) judge
    whether that difference matters.
    """
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        # Sentinel = max FINITE f32 bit pattern (0x7F7FFFFF), not INT32_MAX:
        # the never-updated key is later bitcast to f32 by select_k_packed's
        # PartialReduce path, and 0x7FFFFFFF would read as NaN there.
        key_ref[...] = jnp.full(key_ref.shape, np.int32(0x7F7FFFFF),
                                key_ref.dtype)

    q = q_ref[0]                       # (BQ, 8)  f32
    s = s_ref[0]                       # (8, BS)  f32
    # Manual bf16_3x (== lax.Precision.HIGH, which Mosaic won't lower):
    # x = hi + lo with hi = bf16(x); q@s ~= qh@sh + qh@sl + ql@sh, dropping
    # only the lo*lo term (~2^-16 relative) — identical math to the brute
    # path. Each pass is a native bf16 MXU matmul with f32 accumulation.
    qh = q.astype(jnp.bfloat16)
    ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
    sh = s.astype(jnp.bfloat16)
    sl = (s - sh.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))

    def bf16_dot(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32)

    d = bf16_dot(qh, sh) + bf16_dot(qh, sl) + bf16_dot(ql, sh)  # (BQ, BS)

    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    low_mask = np.int32((1 << code_bits) - 1)
    bq, bs = d.shape
    # Column code for every element in one shot: tile base + slice index.
    code = (t * n_slices
            + jax.lax.broadcasted_iota(jnp.int32, (bq, bs), 1) // _LANE)
    keyed = jnp.bitwise_or(jnp.bitwise_and(bits, ~low_mask), code)
    # One reduce over the slice axis instead of an unrolled min chain.
    m = jnp.min(keyed.reshape(bq, n_slices, _LANE), axis=1)
    if cpl == 1:
        key_ref[0, :, :] = jnp.minimum(key_ref[0, :, :], m)
    else:
        # Tile-parity slots: even tiles feed slot 0, odd tiles slot 1 — two
        # independent running minima per residue from disjoint column sets.
        @pl.when(t % 2 == 0)
        def _():
            key_ref[0, :, :_LANE] = jnp.minimum(key_ref[0, :, :_LANE], m)

        @pl.when(t % 2 == 1)
        def _():
            key_ref[0, :, _LANE:] = jnp.minimum(key_ref[0, :, _LANE:], m)


def packed_code_bits(ns: int) -> int:
    """Mantissa bits the tile code occupies for an Ns-column support set."""
    n_codes = ns // _LANE
    return max(int(np.ceil(np.log2(max(n_codes, 2)))), 1)


@partial(jax.jit, static_argnames=("bq", "bs", "cpl", "interpret"))
def lane_min_keys_packed(q_aug: jnp.ndarray, s_aug_t: jnp.ndarray,
                         bq: int = 256, bs: int = 2048, cpl: int = 2,
                         interpret: bool = False):
    """Packed-key fused search, raw keys out (use select_k_packed to finish).

    Keys encode (distance bits & ~low_mask) | tile_code; distances are
    rounded DOWN by at most 2^-(23-code_bits) relative (the mantissa bits
    the tile code occupies) — ~1.5e-5 at L0 scale, far inside the
    bf16-grade tolerance of the brute path's top-k.
    """
    if cpl not in (1, 2):
        raise ValueError(f"cpl must be 1 or 2, got {cpl}")
    b, nq, da = q_aug.shape
    _, _, ns = s_aug_t.shape
    bq = min(bq, nq)
    bs = min(bs, ns)
    if da != 8 or nq % bq or ns % bs or bs % _LANE:
        raise ValueError(f"bad shapes: {q_aug.shape} {s_aug_t.shape} "
                         f"bq={bq} bs={bs}")
    n_slices = bs // _LANE
    code_bits = packed_code_bits(ns)
    if code_bits > 12:
        raise ValueError(f"{ns} support columns need {code_bits} code bits; "
                         "the mantissa rounding would exceed 2^-11")
    grid = (b, nq // bq, ns // bs)
    kernel = partial(_lane_min_packed_kernel, n_slices=n_slices, cpl=cpl,
                     code_bits=code_bits)
    out_w = cpl * _LANE
    keys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 8), lambda bi, qi, ti: (bi, qi, 0)),
            pl.BlockSpec((1, 8, bs), lambda bi, qi, ti: (bi, 0, ti)),
        ],
        out_specs=pl.BlockSpec((1, bq, out_w), lambda bi, qi, ti: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq, out_w), jnp.int32),
        interpret=interpret,
    )(q_aug, s_aug_t)
    return keys


def lane_min_candidates_packed(q_aug: jnp.ndarray, s_aug_t: jnp.ndarray,
                               bq: int = 256, bs: int = 2048, cpl: int = 2,
                               interpret: bool = False):
    """Packed-key fused search: same contract as lane_min_candidates.

    Unpacks every candidate (256 values+cols per query). Prefer
    lane_min_keys_packed + select_k_packed, which selects k of 256 FIRST
    on the PartialReduce unit and unpacks only the survivors.
    """
    keys = lane_min_keys_packed(q_aug, s_aug_t, bq=bq, bs=bs, cpl=cpl,
                                interpret=interpret)
    code_bits = packed_code_bits(s_aug_t.shape[2])
    low_mask = np.int32((1 << code_bits) - 1)
    code = jnp.bitwise_and(keys, low_mask)
    vals = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(keys, ~low_mask), jnp.float32)
    lane = jnp.tile(jnp.arange(_LANE, dtype=jnp.int32), (cpl,))
    cols = code * _LANE + lane[None, None, :]
    return vals, cols


def select_k_packed(keys: jnp.ndarray, k: int, code_bits: int, cpl: int,
                    exact: bool = False, recall: float = 0.95):
    """K smallest candidates straight from packed keys — no sort, no gather.

    The packed key is monotone in distance AND non-negative (d >= 0 keeps
    the sign bit clear), so its int32 bit pattern reinterpreted as f32 is
    ALSO monotone — `approx_max_k(-bitcast(keys))` selects the k nearest on
    the TPU PartialReduce unit instead of a full sort, and the support
    column falls out arithmetically: col = (key & low_mask) * 128 +
    (slot % 128) (slot layout: [parity-0 lanes | parity-1 lanes]).
    The squared distance is recovered by masking the code bits back out.

    Returns (vals, cols): (B, Nq, k) f32 squared distances and int32 columns.
    """
    kf = jax.lax.bitcast_convert_type(keys, jnp.float32)
    if exact:
        neg_kf, slot = jax.lax.top_k(-kf, k)
    else:
        neg_kf, slot = jax.lax.approx_max_k(-kf, k, recall_target=recall)
    sel = jax.lax.bitcast_convert_type(-neg_kf, jnp.int32)
    low_mask = np.int32((1 << code_bits) - 1)
    vals = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(sel, ~low_mask), jnp.float32)
    cols = jnp.bitwise_and(sel, low_mask) * _LANE + slot % _LANE
    return vals, cols


@partial(jax.jit, static_argnames=("bq", "bs", "cpl", "interpret"))
def lane_min_candidates(q_aug: jnp.ndarray, s_aug_t: jnp.ndarray,
                        bq: int = 256, bs: int = 2048, cpl: int = 2,
                        interpret: bool = False):
    """Per-lane-residue running minima of the distance matrix, fused.

    Args:
        q_aug: (B, Nq, 8) f32 — [-2q | |q|^2 | 1 | 0-pad] augmented queries.
        s_aug_t: (B, 8, Ns) f32 — [s | 1 | |s|^2 | 0-pad]^T augmented supports.
        bq: query block rows per grid cell (Nq % bq == 0).
        bs: support columns per grid step (Ns % bs == 0, bs % 128 == 0).
        cpl: candidates kept per lane residue (1 or 2).

    Returns:
        vals: (B, Nq, cpl*128) f32 — candidate squared distances (4e9 where
            the residue class was never beaten, e.g. tiny Ns).
        cols: (B, Nq, cpl*128) int32 — support column of each candidate.
    """
    if cpl not in (1, 2):
        raise ValueError(f"cpl must be 1 or 2, got {cpl}")
    b, nq, da = q_aug.shape
    _, _, ns = s_aug_t.shape
    bq = min(bq, nq)
    bs = min(bs, ns)
    if da != 8 or nq % bq or ns % bs or bs % _LANE:
        raise ValueError(f"bad shapes: {q_aug.shape} {s_aug_t.shape} "
                         f"bq={bq} bs={bs}")
    n_slices = bs // _LANE
    grid = (b, nq // bq, ns // bs)
    kernel = partial(_lane_min_kernel, n_slices=n_slices, cpl=cpl)
    out_w = cpl * _LANE
    vals, tiles = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 8), lambda bi, qi, ti: (bi, qi, 0)),
            pl.BlockSpec((1, 8, bs), lambda bi, qi, ti: (bi, 0, ti)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, out_w), lambda bi, qi, ti: (bi, qi, 0)),
            pl.BlockSpec((1, bq, out_w), lambda bi, qi, ti: (bi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq, out_w), jnp.float32),
            jax.ShapeDtypeStruct((b, nq, out_w), jnp.int32),
        ],
        interpret=interpret,
    )(q_aug, s_aug_t)
    # tile_id -> absolute support column: col = tile_id * 128 + lane residue.
    lane = jnp.tile(jnp.arange(_LANE, dtype=jnp.int32), (cpl,))
    cols = tiles * _LANE + lane[None, None, :]
    return vals, cols
