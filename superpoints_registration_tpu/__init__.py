"""TPU-native superpoint registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
neu-vi/Superpoints_Registration ("A Strong Baseline for Point Cloud Registration
via Direct Superpoints Matching"): pairwise rigid registration of 3D point
clouds via a KPConv superpoint backbone, a source<->target cross-attention
transformer, a dual-softmax direct matching head, and weighted Kabsch /
Sinkhorn pose solvers.

Unlike the PyTorch reference (ragged tensors, C++/CUDA library preprocessing,
python loops over batch items), everything here is fixed-shape and mask-based
so whole scene-pair batches run under a single `jit` and shard over a TPU mesh.
"""

__version__ = "0.1.0"
