"""One-shot / serving inference API: register a pair of raw point clouds.

The reference exposes registration only through its test harness
(src/test.py); a deployable framework needs a direct surface. `Registrar`
wraps a trained model + config: it pads raw clouds to the static budgets,
runs the jitted forward (compiled once per budget, cached), and returns the
pose with correspondences and confidence.

    reg = Registrar.from_checkpoint('logs/.../ckpt', cfg)
    out = reg.register(src_xyz, tgt_xyz)          # numpy (N,3), (M,3)
    out['pose']          # (3, 4) src -> tgt
    out['corr_src'], out['corr_tgt'], out['corr_weight']

Batched serving: `register_batch(list_of_pairs)` pads to the configured
batch and amortizes dispatch; pairs beyond the first dimension of the
compiled program reuse the same executable.

Multi-chip serving: pass `mesh` (e.g. `parallel.mesh.make_mesh()`) to shard
the pair axis over a data-parallel device mesh — params replicate, each
chip registers batch_size/n_devices pairs per dispatch, XLA partitions the
whole forward (the reference's serving path is single-GPU only).
"""
from __future__ import annotations

import warnings

import numpy as np

from .config import Config
from .data.collate import collate_pairs


class Registrar:
    def __init__(self, cfg, model, params, batch_size: int | None = None,
                 mesh=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.budget = int(cfg.level_budgets[0])
        self.batch_size = int(batch_size or cfg.get('test_batch_size', 1))
        self.mesh = mesh
        if mesh is not None:
            # One executable, batch sharded over the mesh's pair axis: round
            # the batch up so every chip gets equal work.
            n = mesh.devices.size
            self.batch_size = -(-self.batch_size // n) * n
        self._apply = None

    @staticmethod
    def from_checkpoint(ckpt_dir, cfg, batch_size: int | None = None,
                        step: int | None = None, mesh=None) -> "Registrar":
        import jax
        from .models import build_model
        from .parallel.train_step import TrainState
        from .train.checkpoint import CheckpointManager
        from .train.optim import make_optimizer
        from .utils.convert_reference import maybe_install_kernel_overrides

        # Reference-converted checkpoints ship their kernel dispositions;
        # install before the model traces (utils/convert_reference.py).
        maybe_install_kernel_overrides(ckpt_dir)
        model = build_model(cfg.get('model', 'regtr.RegTR'), cfg)
        reg = Registrar(cfg, model, None, batch_size, mesh=mesh)
        dummy = reg._collate([(np.zeros((4, 3), np.float32),
                               np.zeros((4, 3), np.float32))])
        init = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
        template = TrainState.create(init, make_optimizer(cfg))
        state, _ = CheckpointManager(ckpt_dir).restore(template, step=step)
        reg.params = state.params
        return reg

    def _collate(self, pairs):
        samples = []
        for src, tgt in pairs:
            # collate_pairs silently random-subsamples clouds over the
            # level-0 budget; serving callers must know points were dropped
            # (evaluate.py refuses this case outright for metrics).
            for name, pts in (('src', src), ('tgt', tgt)):
                if len(pts) > self.budget:
                    warnings.warn(
                        f'{name} cloud has {len(pts)} points > level-0 budget '
                        f'{self.budget}; a random subsample of {self.budget} '
                        'points will be registered. Raise level_budgets[0] '
                        '(and recalibrate) to use the full cloud.',
                        stacklevel=3)
            samples.append({
                'src_xyz': np.asarray(src, np.float32),
                'tgt_xyz': np.asarray(tgt, np.float32),
                'src_overlap': np.zeros(len(src), np.float32),
                'tgt_overlap': np.zeros(len(tgt), np.float32),
                'pose': np.concatenate(
                    [np.eye(3, dtype=np.float32),
                     np.zeros((3, 1), np.float32)], axis=1),
            })
        while len(samples) < self.batch_size:
            samples.append(samples[-1])
        rng = np.random.default_rng(0)
        return {k: v for k, v in
                collate_pairs(samples, self.budget, rng).items()}

    def _fn(self):
        if self._apply is None:
            import jax

            def apply(params, batch):
                out = self.model.apply(params, batch, compute_loss=False)
                return {'pose': out['pose'],
                        'corr_src': out['src_corr'],
                        'corr_tgt': out['tgt_corr'],
                        'corr_weight': out['corr_weight'],
                        'corr_valid': out['corr_valid'],
                        'src_overlap': out['src_overlap'],
                        'tgt_overlap': out['tgt_overlap']}

            if self.mesh is not None:
                # Sharding prefixes: params replicated, every batch/output
                # leaf sharded on its leading (pair) axis.
                from .parallel.mesh import batch_sharding, replicated
                dp = batch_sharding(self.mesh)
                self._apply = jax.jit(apply,
                                      in_shardings=(replicated(self.mesh), dp),
                                      out_shardings=dp)
            else:
                self._apply = jax.jit(apply)
        return self._apply

    def register(self, src_xyz, tgt_xyz) -> dict:
        """Register one pair; returns numpy pose (3, 4) mapping src -> tgt
        plus correspondences/weights/overlap scores."""
        return self.register_batch([(src_xyz, tgt_xyz)])[0]

    def register_batch(self, pairs) -> list:
        """Register up to `batch_size` pairs in one dispatch."""
        assert len(pairs) >= 1
        out_all = []
        for i in range(0, len(pairs), self.batch_size):
            chunk = pairs[i:i + self.batch_size]
            batch = self._collate(chunk)
            out = self._fn()(self.params, batch)
            out = {k: np.asarray(v) for k, v in out.items()}
            for b in range(len(chunk)):
                w = out['corr_weight'][b]
                keep = w > 0
                out_all.append({
                    'pose': out['pose'][b],
                    'corr_src': out['corr_src'][b][keep],
                    'corr_tgt': out['corr_tgt'][b][keep],
                    'corr_weight': w[keep],
                    'src_overlap': out['src_overlap'][b],
                    'tgt_overlap': out['tgt_overlap'][b],
                })
        return out_all


def load_config_for_checkpoint(ckpt_dir) -> Config:
    """Recover the run config snapshotted next to a checkpoint directory
    (mirrors the reference's resume config recovery, train.py:67-79)."""
    import json
    import pathlib
    d = pathlib.Path(ckpt_dir)
    for parent in (d, d.parent):
        snap = parent / 'config.json'
        if snap.exists():
            return Config(json.loads(snap.read_text()))
    raise FileNotFoundError(f'no config.json next to {ckpt_dir}')
