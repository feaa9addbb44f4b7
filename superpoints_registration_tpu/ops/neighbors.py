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
    s_sq = jnp.where(s_mask, s_sq, jnp.inf)  # invalid supports never match
    r_sq = jnp.asarray(radius, jnp.float32) ** 2

    def process(q_chunk, qm_chunk):
        # HIGH (bf16_3x) instead of HIGHEST: the dropped lo*lo term is
        # ~(4e-3 m)^2 = 2e-5 m^2, two orders below r^2 at the finest level,
        # while HIGHEST's extra passes cost ~1.5x of the whole search
        # (measured 66 -> 43 ms at L0 scale on v5e).
        dots = jnp.matmul(q_chunk, s.T, precision=jax.lax.Precision.HIGH)
        sqd = jnp.sum(q_chunk * q_chunk, axis=-1)[:, None] - 2.0 * dots + s_sq[None, :]
        if exact:
            neg_vals, idx = jax.lax.top_k(-sqd, k)
        else:
            # The (chunk, Ns) distance matrix is pure HBM traffic; storing it
            # as bf16 halves it. Crucially the |q-s|^2 expansion's
            # CANCELLATION still happens in f32 (dot epilogue), so the bf16
            # rounding is ~0.4% RELATIVE to the small result — selection and
            # the radius test are boundary-accurate to ~0.2% of r, far below
            # the 0.95 recall_target's own miss rate.
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
