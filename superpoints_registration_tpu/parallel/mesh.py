"""Device mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP distributed layer (src/train.py:57-65,
src/trainer.py:47-48, src/utils/comm.py) with single-controller JAX SPMD:
one `Mesh` over all chips, batch sharded over the 'data' axis, params
replicated; XLA inserts the gradient all-reduce (psum) over ICI.

Multi-host: call `init_distributed()` (jax.distributed.initialize) before
creating the mesh; per-host data loading feeds each host its batch shard via
`host_local_to_global` (replacing torch's DistributedSampler,
src/data_loaders/__init__.py:76).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (DCN rendezvous). No-op when single-process.

    Mirrors torch.distributed.init_process_group('nccl', 'env://')
    (src/train.py:63) on the JAX side.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(devices=None, data_axis: str = 'data') -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (data_axis,))


def make_mesh_2d(n_data: int, n_seq: int, devices=None,
                 data_axis: str = 'data', seq_axis: str = 'seq') -> Mesh:
    """(data, seq) mesh: batch sharded over `data_axis`, attention sequence
    sharded over `seq_axis` (ring attention, parallel/ring_attention.py).
    The seq axis is laid out minor so K/V ring hops ride adjacent-chip ICI.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data * n_seq > devices.size:
        raise ValueError(f"mesh {n_data}x{n_seq} needs {n_data * n_seq} "
                         f"devices, have {devices.size}")
    return Mesh(devices[:n_data * n_seq].reshape(n_data, n_seq),
                (data_axis, seq_axis))


def make_mesh_from_config(cfg, devices=None) -> Mesh:
    """Training/eval mesh from config: a 1-D data-parallel mesh, or — when
    `attention_impl: ring` — a (data, seq) mesh with `ring_seq_shards`
    devices on the sequence axis, installed for the ring-attention modules.
    """
    if cfg.get('attention_impl', 'dense') == 'ring':
        devices = list(devices if devices is not None else jax.devices())
        n_seq = int(cfg.get('ring_seq_shards', 0)) or len(devices)
        n_data = len(devices) // n_seq
        if n_data == 0:
            raise ValueError(
                f"ring_seq_shards={n_seq} exceeds the {len(devices)} "
                f"available device(s)")
        mesh = make_mesh_2d(n_data, n_seq, devices)
        from .ring_attention import set_ring_mesh
        set_ring_mesh(mesh)
        return mesh
    return make_mesh(devices)


def make_mesh_for_batch(batch_size: int, data_axis: str = 'data') -> Mesh:
    """Mesh over the largest device count that divides batch_size (>= 1)."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]).reshape(-1), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = 'data') -> NamedSharding:
    """Shard the leading (pair) axis of every batch array over the mesh."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, data_axis: str = 'data') -> dict:
    """Device-put a host batch with the leading axis sharded over `data_axis`.

    The leading dimension must be divisible by the mesh size.
    """
    sh = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def host_local_to_global(batch: dict, mesh: Mesh, data_axis: str = 'data') -> dict:
    """Assemble a global sharded batch from each host's LOCAL shard.

    Multi-host: every process passes only its own loader shard
    (get_dataloader(..., num_shards=jax.process_count(),
    shard_index=jax.process_index())); the returned arrays are global jax
    Arrays whose leading axis is the concatenation over processes, sharded
    over `data_axis`. Replaces torch's DistributedSampler + DDP input split
    (src/data_loaders/__init__.py:76). Single-process: identical to
    shard_batch.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, data_axis)
    sh = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def is_main_process() -> bool:
    """Rank-0 check (src/utils/comm.py:29-33 equivalent)."""
    return jax.process_index() == 0


def barrier():
    """Cross-host barrier (src/utils/comm.py:35-41 equivalent)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('barrier')
