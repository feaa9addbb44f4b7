"""MXU-based windowed row gather: TPU-native replacement for XLA's slow gather.

The KPConv hot loop gathers (Q, K) neighbor rows from an (N, D) table per
cloud. XLA's native gather runs ~75x off HBM speed-of-light on TPU (measured
~170 ms for 16 x 16384 x 40 x 32 f32 on v5e vs ~2 ms of pure traffic), and a
naive full-N one-hot matmul is flop-bound (~330 ms). This kernel exploits the
*spatial coherence* of neighbor indices: pyramid points are stored in
voxel-sorted order, so the ~26 spatially-adjacent queries in one row tile
reference indices spanning a narrow window. Per tile, we gather only a
`window_blocks * block`-wide slice of the table, selected dynamically through
a scalar-prefetched per-tile start, and select rows with an exact one-hot
matmul on the MXU.

Rows whose index falls outside the tile's window (including shadow indices)
come back as zeros; callers rewrite their coordinates to the shadow sentinel
via the returned `covered` mask and can monitor the dropped-neighbor count —
a graceful, *measured* degradation strictly analogous to the reference's own
neighborhood_limits truncation (kpconv.py:714-746).

Exactness: a bf16 one-hot is exact, so `onehot @ table` reproduces bf16 table
rows exactly; f32 payloads needing more precision (coordinates) are split
into hi/lo bf16 halves and recombined (error ~2^-16 relative).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Index sentinel that never lands in-window. Deliberately a HOST-side
# constant (np.int32, not jnp): a module-level device array would be created
# at import time, and if this module is first imported while a jit trace is
# active, mid-trace device-constant creation triggers an axon-runtime
# repeated-dispatch fault (see docs/pallas_fault_repro.py history).
SHADOW_FAR = np.int32(2 ** 30)


def _gather_kernel(starts_ref, idx_ref, table_ref, out_ref, *, block: int,
                   rows: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ids = idx_ref[:]                                        # (rows, 1) int32
    local = ids - (starts_ref[i] + j) * block
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, block), 1)
    onehot = (local == iota).astype(jnp.bfloat16)           # exact 0/1
    partial = jnp.dot(onehot, table_ref[:],
                      preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial.astype(out_ref.dtype)

    @pl.when(j > 0)
    def _():
        out_ref[:] = (out_ref[:].astype(jnp.float32) + partial).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def gather_rows_windowed(table: jnp.ndarray, idx: jnp.ndarray,
                         row_tile: int = 1024, block: int = 1024,
                         window_blocks: int = 2, interpret: bool = False,
                         out_bf16: bool = False):
    """Windowed one-hot-MXU gather.

    The table window each row tile reads is selected by a scalar-prefetched
    per-tile block start, so the pallas runtime double-buffers the window
    fetch across grid steps automatically (unlike a manual in-kernel DMA,
    which serializes ~µs of DMA latency per tile). With window_blocks == 1
    each tile is a single grid step: one (block, D) table fetch, one
    (row_tile, block) x (block, D) one-hot matmul, one output write.

    Args:
        table: (N, D) bf16 (N padded to a multiple of `block` internally).
        idx: (R,) int32 row indices; out-of-table values (e.g. SHADOW_FAR)
            yield zero rows.
        row_tile: rows per grid step.
        block: table block width (the window is window_blocks * block wide).
        window_blocks: number of consecutive blocks fetched per tile.
        out_bf16: emit bf16 output (exact for bf16 tables — the one-hot
            matmul accumulates in f32 and each output row IS a table row).

    Returns:
        out: (R, D) f32 (or bf16) gathered rows (zeros where not covered).
        covered: (R,) bool — True where idx fell inside its tile's window.
    """
    n, d = table.shape
    r = idx.shape[0]
    assert table.dtype == jnp.bfloat16
    assert row_tile % 128 == 0

    n_pad = -(-n // block) * block
    if n_pad != n:
        table = jnp.pad(table, ((0, n_pad - n), (0, 0)))
    r_pad = -(-r // row_tile) * row_tile
    if r_pad != r:
        idx = jnp.pad(idx, (0, r_pad - r), constant_values=SHADOW_FAR)

    n_tiles = r_pad // row_tile
    n_blocks = n_pad // block
    # A window can't be wider than the table itself.
    window_blocks = min(window_blocks, n_blocks)
    tiles = idx.reshape(n_tiles, row_tile)

    # Per-tile window start (block units): centered on the MEAN in-table
    # index (measured on real scenes: mean-centered W=2048 drops only ~2% of
    # neighbors vs ~20% for min-anchored; heavy Morton-jump tails drag the
    # min), clamped so the window stays inside the table.
    in_table = tiles < n
    cnt = jnp.maximum(jnp.sum(in_table, axis=1), 1)
    center = (jnp.sum(jnp.where(in_table, tiles, 0), axis=1) // cnt)
    half = (window_blocks * block) // 2
    starts = jnp.clip((center - half + block // 2) // block, 0,
                      max(n_blocks - window_blocks, 0))
    starts = starts.astype(jnp.int32)

    lo = starts * block
    covered2d = in_table & (tiles >= lo[:, None]) \
        & (tiles < lo[:, None] + window_blocks * block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, window_blocks),
        in_specs=[
            pl.BlockSpec((row_tile, 1), lambda i, j, starts: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j, starts: (starts[i] + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, d), lambda i, j, starts: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    kwargs = {} if interpret else dict(compiler_params=pltpu.CompilerParams(
        dimension_semantics=('arbitrary', 'arbitrary')))
    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_gather_kernel, block=block, rows=row_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, d), out_dtype),
        interpret=interpret,
        **kwargs,
    )(starts, idx.reshape(r_pad, 1), table)
    return out[:r], covered2d.reshape(r_pad)[:r]


def _gather_fwd(table, idx, row_tile, block, window_blocks, interpret=False,
                out_bf16=False):
    out, covered = gather_rows_windowed(table, idx, row_tile, block,
                                        window_blocks, interpret, out_bf16)
    return (out, covered), (idx, covered, table)


def _gather_bwd(row_tile, block, window_blocks, interpret, out_bf16, res,
                cotangents):
    """d_table = scatter-add of output cotangents to their source rows
    (covered rows only — uncovered rows contributed zeros)."""
    idx, covered, table = res
    n = table.shape[0]
    g, _ = cotangents
    g = jnp.where(covered[:, None], g, 0.0)
    safe_idx = jnp.clip(idx, 0, n - 1)
    d_table = jax.ops.segment_sum(g, safe_idx, num_segments=n)
    return d_table.astype(table.dtype), None


gather_rows_windowed.defvjp(_gather_fwd, _gather_bwd)


def _gather_dma_kernel(starts_ref, idx_ref, table_hbm, out_ref, scratch, sem,
                       *, block: int, rows: int, window_blocks: int):
    """DMA-variant kernel: the window is copied HBM->VMEM with an async copy
    whose start comes from an SMEM scalar — no dynamic block index_map, no
    scalar-prefetch grid (probe/alternative for the runtime fault seen with
    PrefetchScalarGridSpec)."""
    start = starts_ref[0, 0, 0]
    w = window_blocks * block
    dma = pltpu.make_async_copy(table_hbm.at[pl.ds(start * block, w)],
                                scratch, sem)
    dma.start()
    dma.wait()

    ids = idx_ref[:]                                        # (rows, 1)
    local = ids - start * block
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    onehot = (local == iota).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(onehot, scratch[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_rows_windowed_dma(table: jnp.ndarray, idx: jnp.ndarray,
                             row_tile: int = 1024, block: int = 1024,
                             window_blocks: int = 2):
    """Same contract as gather_rows_windowed, via a manual window DMA whose
    start comes from an SMEM scalar. Unlike the PrefetchScalarGridSpec
    variant this survives repeated dispatch in this environment, and measured
    35-50 ms for all L0 rows (vs 93 ms bf16 XLA gather)."""
    n, d = table.shape
    r = idx.shape[0]
    assert table.dtype == jnp.bfloat16
    # The window DMA slices rows of the HBM table; Mosaic requires the lane
    # dimension be 128-aligned for sliced memrefs.
    d_pad = -(-d // 128) * 128
    if d_pad != d:
        table = jnp.pad(table, ((0, 0), (0, d_pad - d)))
    n_pad = -(-n // block) * block
    if n_pad != n:
        table = jnp.pad(table, ((0, n_pad - n), (0, 0)))
    r_pad = -(-r // row_tile) * row_tile
    if r_pad != r:
        idx = jnp.pad(idx, (0, r_pad - r), constant_values=SHADOW_FAR)
    n_tiles = r_pad // row_tile
    n_blocks = n_pad // block
    window_blocks = min(window_blocks, n_blocks)
    tiles = idx.reshape(n_tiles, row_tile)

    in_table = tiles < n
    cnt = jnp.maximum(jnp.sum(in_table, axis=1), 1)
    center = (jnp.sum(jnp.where(in_table, tiles, 0), axis=1) // cnt)
    half = (window_blocks * block) // 2
    starts = jnp.clip((center - half + block // 2) // block, 0,
                      max(n_blocks - window_blocks, 0)).astype(jnp.int32)
    lo = starts * block
    covered2d = in_table & (tiles >= lo[:, None]) \
        & (tiles < lo[:, None] + window_blocks * block)

    out = pl.pallas_call(
        functools.partial(_gather_dma_kernel, block=block, rows=row_tile,
                          window_blocks=window_blocks),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((row_tile, d_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, d_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((window_blocks * block, d_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(starts.reshape(n_tiles, 1, 1), idx.reshape(r_pad, 1), table)
    return out[:r, :d], covered2d.reshape(r_pad)[:r]


def _gather_dma_fwd(table, idx, row_tile, block, window_blocks):
    out, covered = gather_rows_windowed_dma(table, idx, row_tile, block,
                                            window_blocks)
    return (out, covered), (idx, covered, table)


def _gather_dma_bwd(row_tile, block, window_blocks, res, cotangents):
    idx, covered, table = res
    n = table.shape[0]
    g, _ = cotangents
    g = jnp.where(covered[:, None], g, 0.0)
    safe_idx = jnp.clip(idx, 0, n - 1)
    d_table = jax.ops.segment_sum(g, safe_idx, num_segments=n)
    return d_table.astype(table.dtype), None


gather_rows_windowed_dma.defvjp(_gather_dma_fwd, _gather_dma_bwd)


def split_f32_to_bf16_hi_lo(x: jnp.ndarray):
    """Split f32 into two bf16 parts with x ~= hi + lo (error ~2^-16 rel)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def gather_coords_feats_batch(points: jnp.ndarray, feats: jnp.ndarray,
                              idx: jnp.ndarray, shadow_coord: float = 1e6,
                              block: int = 1024, window_blocks: int = 2,
                              row_tile: int = 1024, interpret: bool = False):
    """Fused neighbor gather for a stack of clouds (no vmap: clouds are
    concatenated into one table and indices are globalized — row tiles never
    straddle clouds because Q*K per cloud is a multiple of row_tile whenever
    Q is a multiple of 128 * gcd-friendly K packing; we enforce it by padding).

    Args:
        points: (B, N, 3) f32 support coordinates.
        feats: (B, N, C) features.
        idx: (B, Q, K) int32 with shadow == N.

    Returns:
        coords: (B, Q, K, 3) f32 (uncovered/shadow rows = shadow_coord).
        gfeats: (B, Q, K, C) f32 (uncovered/shadow rows = 0).
        dropped: () int32 — count of valid (non-shadow) neighbors that fell
            outside their tile's window (monitor; 0 in the common case).
    """
    b, n, _ = points.shape
    _, q, k = idx.shape
    c = feats.shape[-1]

    hi, lo = split_f32_to_bf16_hi_lo(points)
    table = jnp.concatenate([hi, lo, feats.astype(jnp.bfloat16)], axis=-1)
    table = table.reshape(b * n, 3 + 3 + c)

    is_shadow = idx >= n
    offsets = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    gidx = jnp.where(is_shadow, SHADOW_FAR, idx + offsets)

    # Pad each cloud's rows so tiles never straddle cloud boundaries.
    rows_per_cloud = q * k
    pad_rows = (-rows_per_cloud) % row_tile
    flat = gidx.reshape(b, rows_per_cloud)
    if pad_rows:
        flat = jnp.pad(flat, ((0, 0), (0, pad_rows)),
                       constant_values=SHADOW_FAR)
    if interpret:
        out, covered = gather_rows_windowed(table, flat.reshape(-1), row_tile,
                                            block, window_blocks, interpret)
    else:
        out, covered = gather_rows_windowed_dma(table, flat.reshape(-1),
                                                row_tile, block, window_blocks)
    out = out.reshape(b, rows_per_cloud + pad_rows, 3 + 3 + c)
    covered = covered.reshape(b, rows_per_cloud + pad_rows)
    if pad_rows:
        out = out[:, :rows_per_cloud]
        covered = covered[:, :rows_per_cloud]
    out = out.reshape(b, q, k, 3 + 3 + c)
    covered = covered.reshape(b, q, k)

    coords = out[..., :3] + out[..., 3:6]
    coords = jnp.where(covered[..., None], coords, shadow_coord)
    gfeats = jnp.where(covered[..., None], out[..., 6:], 0.0)
    dropped = jnp.sum((~covered) & (~is_shadow), dtype=jnp.int32)
    return coords, gfeats, dropped


def gather_feats_batch(feats: jnp.ndarray, idx: jnp.ndarray,
                       block: int = 1024, window_blocks: int = 2,
                       row_tile: int = 1024):
    """Feature-only windowed gather for a stack of clouds (e.g. the max-pool
    shortcut in strided blocks). Shadow/uncovered rows are zeros.

    Args: feats (B, N, C); idx (B, Q, K) with shadow == N.
    Returns: (B, Q, K, C) f32.
    """
    b, n, c = feats.shape
    _, q, k = idx.shape
    table = feats.astype(jnp.bfloat16).reshape(b * n, c)
    is_shadow = idx >= n
    offsets = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    gidx = jnp.where(is_shadow, SHADOW_FAR, idx + offsets)

    rows_per_cloud = q * k
    pad_rows = (-rows_per_cloud) % row_tile
    flat = gidx.reshape(b, rows_per_cloud)
    if pad_rows:
        flat = jnp.pad(flat, ((0, 0), (0, pad_rows)),
                       constant_values=SHADOW_FAR)
    out, covered = gather_rows_windowed_dma(table, flat.reshape(-1),
                                            row_tile, block, window_blocks)
    out = out.reshape(b, rows_per_cloud + pad_rows, c)
    covered = covered.reshape(b, rows_per_cloud + pad_rows)
    if pad_rows:
        out = out[:, :rows_per_cloud]
        covered = covered[:, :rows_per_cloud]
    return jnp.where(covered.reshape(b, q, k)[..., None],
                     out.reshape(b, q, k, c), 0.0)
