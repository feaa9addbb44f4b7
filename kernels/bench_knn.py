"""On-chip microbenchmark for the L0 neighbor search variants.

Reproduces the docs/PERF.md round-3 measurement setup — 16 Morton-sorted
clutter clouds x 16384 points, r = 6.25 cm, K = 25 (the L0 self-knn of the
3DMatch config) — and times each search variant end-to-end (same contract:
(B, Nq, K) int32 indices), reporting milliseconds and recall against the
exact f32 search. This is the measurement the round-3 verdict asked to be
re-run for the packed-key kernel revision (VERDICT item 3; replaces the
reference's CPU nanoflann path, cpp_wrappers/.../neighbors.cpp:125-333).

Usage:  python kernels/bench_knn.py [--n 16384] [--b 16] [--k 25] [--r 0.0625]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def _make_batch(b, n, seed=0):
    from bench import make_scene
    from superpoints_registration_tpu.ops.morton import morton_keys
    clouds = []
    for i in range(b):
        rng = np.random.default_rng((seed, i))
        pts = make_scene(rng, n)
        if len(pts) < n:  # pad by repeating (mask stays all-true: L0 is full)
            pts = np.concatenate([pts, pts[: n - len(pts)]])
        coords = np.floor((pts - pts.min(0)) / 0.025).astype(np.int32)
        hi, lo = morton_keys(jnp.asarray(coords))
        order = np.lexsort((np.asarray(lo), np.asarray(hi)))
        clouds.append(pts[order])
    pts = jnp.asarray(np.stack(clouds), jnp.float32)
    mask = jnp.ones(pts.shape[:2], bool)
    return pts, mask


def _recall(idx, idx_exact, ns):
    """Fraction of exact neighbors (incl. shadow slots) recovered, row-wise
    set overlap — shadow (== ns) slots must match too so a variant cannot
    score by returning garbage where there is no neighbor."""
    hit = (idx[..., None] == idx_exact[..., None, :]).any(-2)
    return float(jnp.mean(hit.astype(jnp.float32)))


def _time(fn, inputs, iters=3):
    """Median wall time over `iters` passes x len(inputs) distinct batches.

    Two traps on the axon tunnel backend (both hit in round 4):
    `block_until_ready` does not reliably block, and identical dispatches
    get memoized — so sync by fetching a reduced scalar to the host and
    rotate distinct input batches.
    """
    g = jax.jit(lambda q, m: jnp.sum(fn(q, m).astype(jnp.float32)))
    float(g(*inputs[0]))                # compile + warm
    ts = []
    for _ in range(iters):
        for q, m in inputs:
            t0 = time.perf_counter()
            float(g(q, m))
            ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3, fn(*inputs[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=16384)
    p.add_argument('--b', type=int, default=16)
    p.add_argument('--k', type=int, default=25)
    p.add_argument('--r', type=float, default=0.0625)
    p.add_argument('--iters', type=int, default=5)
    args = p.parse_args()

    from superpoints_registration_tpu.ops import neighbors as N

    inputs = [_make_batch(args.b, args.n, seed=s) for s in range(3)]
    pts, mask = inputs[0]
    r, k = args.r, args.k
    print(f'backend={jax.default_backend()} B={args.b} N={args.n} '
          f'K={k} r={r}')

    exact = jax.jit(lambda q, m: N.radius_knn_batch(
        q, m, q, m, r, k, exact=True))
    ms, idx_exact = _time(exact, inputs[:1], iters=1)
    print(f'{"exact f32 top_k":<28} {ms:8.1f} ms  recall 1.000')

    variants = [
        ('brute approx@0.95 (default)',
         jax.jit(lambda q, m: N.radius_knn_batch(q, m, q, m, r, k))),
        ('lane cpl=2 approx',
         jax.jit(lambda q, m: N.radius_knn_lane_batch(
             q, m, q, m, r, k, exact=False))),
        ('lane_packed cpl=2 approx',
         jax.jit(lambda q, m: N.radius_knn_lane_batch(
             q, m, q, m, r, k, packed=True, exact=False))),
        ('lane_packed cpl=2 exact-sel',
         jax.jit(lambda q, m: N.radius_knn_lane_batch(
             q, m, q, m, r, k, packed=True, exact=True))),
        ('lane_packed cpl=1 approx',
         jax.jit(lambda q, m: N.radius_knn_lane_batch(
             q, m, q, m, r, k, packed=True, exact=False, cpl=1))),
    ]
    for name, fn in variants:
        try:
            ms, idx = _time(fn, inputs, iters=args.iters)
        except Exception as e:  # lowering failures are a result, not a crash
            print(f'{name:<28} FAILED: {type(e).__name__}: {str(e)[:120]}')
            continue
        rec = _recall(idx, idx_exact, args.n)
        print(f'{name:<28} {ms:8.1f} ms  recall {rec:.3f}')


if __name__ == '__main__':
    main()
