"""Trainer: epoch/step loop, validation, checkpointing, summaries.

Re-design of the reference Trainer (src/trainer.py:36-321) around jitted SPMD
steps: the per-step host work is only batch collation + dispatch; backward,
grad clip, optimizer and the cross-device gradient reduction all live inside
the single jitted train_step (parallel/train_step.py). Behavioral parity:

  * niter > 0 -> total steps; niter < 0 -> -niter epochs (trainer.py:65)
  * validate_every > 0 in steps, < 0 in epochs (trainer.py:70-72)
  * sanity validation before training (trainer.py:80-82)
  * EMA-smoothed loss display, non-finite loss warnings (trainer.py:150-165)
  * periodic checkpoint keyed on reg_success (generic_reg_model.py:122)
"""
from __future__ import annotations

import pathlib
import time

import jax
import numpy as np

from ..data.loader import DataLoader
from ..parallel.mesh import (make_mesh_for_batch, make_mesh_from_config
                             as _make_training_mesh, replicated, shard_batch)
from ..parallel.train_step import TrainState, make_train_step, make_eval_step
from .checkpoint import CheckpointManager
from .metrics import StatsMeter
from .optim import make_optimizer
from ..utils.logging_utils import SummaryWriterWrapper, prepare_logger


def resolve_warm_start(warm_start) -> tuple[pathlib.Path, int | None]:
    """Resolve a --warm_start path to (manager_root, step | None).

    Accepts either a manager root (.../ckpt -> best/latest step) or a
    specific step directory (.../ckpt/40000 -> exactly that step). An
    all-digit last component is treated as a step directory only if it
    actually holds a checkpoint; an all-digit run dir (for instance
    logs/20260820 named after a date) is a manager root, and stripping it
    would silently restore from the wrong tree.
    """
    ws = pathlib.Path(warm_start)
    if ws.name.isdigit() and (ws / '_CHECKPOINT_METADATA').exists():
        return ws.parent, int(ws.name)
    return ws, None


class Trainer:
    def __init__(self, cfg, run_dir, niter: int | None = None,
                 validate_every: int = -1, nb_sanity_val_steps: int = 2,
                 summary_every: int = 200, logger=None, profile: bool = False):
        self.cfg = cfg
        self.run_dir = run_dir
        self.niter = niter if niter is not None else cfg.get('niter', -1)
        self.validate_every = validate_every
        self.nb_sanity_val_steps = nb_sanity_val_steps
        self.summary_every = summary_every
        self.profile = profile
        self.logger = logger or prepare_logger(run_dir)
        self.saver = CheckpointManager(run_dir / 'ckpt',
                                       max_to_keep=cfg.get('max_to_keep', 6),
                                       keep_period=cfg.get('keep_period', None))
        self.train_writer = SummaryWriterWrapper(run_dir / 'tb' / 'train')
        self.val_writer = SummaryWriterWrapper(run_dir / 'tb' / 'val')

    def fit(self, model, train_loader: DataLoader, val_loader: DataLoader | None,
            resume=None, warm_start=None):
        cfg = self.cfg
        mesh = _make_training_mesh(cfg)
        n_dev = mesh.shape['data']
        if train_loader.batch_size % n_dev != 0:
            raise ValueError(f"batch size {train_loader.batch_size} not divisible "
                             f"by {n_dev} devices")

        # Init params from the first batch's shapes.
        first_batch = next(iter(train_loader))
        params = jax.jit(model.init)(jax.random.PRNGKey(cfg.get('seed', 0)),
                                     first_batch)
        n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
        self.logger.info('model parameters: %.2fM', n_params / 1e6)

        tx = make_optimizer(cfg)
        if warm_start is not None:
            # Params-only initialization from another run's checkpoint:
            # fresh optimizer state, LR schedule, and step counter. Used to
            # transfer features across corpus versions without inheriting a
            # decayed schedule (unlike --resume, which restores everything).
            donor = TrainState.create(params, tx)
            # Accept either a manager root (.../ckpt -> best/latest step) or a
            # specific step directory (.../ckpt/40000 -> exactly that step).
            ws, ws_step = resolve_warm_start(warm_start)
            donor, donor_step = CheckpointManager(ws).restore(donor, step=ws_step)
            params = donor.params
            self.logger.info('warm-started params from %s step %d '
                             '(optimizer/schedule reset)', warm_start,
                             donor_step)
        state = TrainState.create(params, tx)
        global_step = 0
        if resume is not None:
            state, global_step = CheckpointManager(resume).restore(state)
            self.logger.info('resumed from step %d', global_step)
        state = jax.device_put(state, replicated(mesh))

        train_step = make_train_step(model, tx, mesh=mesh)
        eval_step = make_eval_step(model, cfg, mesh=mesh)

        total_iter = (self.niter if self.niter > 0
                      else len(train_loader) * -self.niter)
        validate_every = self.validate_every
        if validate_every == 0:
            # Validate-only mode (reference trainer.py:75-77): run one full
            # validation pass and exit without training.
            if val_loader is None:
                raise ValueError('validate_every=0 requires a val loader')
            self._run_validation(eval_step, state.params, val_loader, mesh,
                                 global_step, save=False, state=state)
            return state
        if validate_every < 0:
            validate_every = -validate_every * len(train_loader)
            self.logger.info('validation interval: %d steps', validate_every)

        if val_loader is not None and self.nb_sanity_val_steps > 0:
            self._run_validation(eval_step, state.params, val_loader, mesh,
                                 global_step, limit_steps=self.nb_sanity_val_steps,
                                 save=False, state=state)

        stats = StatsMeter()
        self._loss_smooth = None
        epoch = 0
        t_start = time.perf_counter()
        done = False
        # Device-side loss dicts pending host transfer. Fetching every step
        # (float(losses['total'])) blocks on the device each iteration and
        # defeats async dispatch; instead losses stay on-device and are
        # fetched in one batch at fetch boundaries. The fetch window is
        # capped below summary_every so a NaN burst is reported within ~50
        # steps rather than up to summary_every later.
        pending: list = []
        fetch_every = max(1, min(self.summary_every, 50))
        steps_done = 0  # steps THIS run — profile window survives resume
        profiling = False
        while not done:
            train_loader.set_epoch(epoch)
            self.logger.info('epoch %d (steps %d - %d)', epoch, global_step,
                             global_step + len(train_loader))
            for batch in train_loader:
                global_step += 1
                steps_done += 1
                # Profile window: 2nd-4th step of this run (the 1st pays
                # compilation; keyed on steps_done, not global_step, so a
                # resumed run still captures a trace).
                if self.profile and steps_done == 2:
                    jax.profiler.start_trace(str(self.run_dir / 'profile'))
                    profiling = True
                sharded = shard_batch(batch, mesh)
                state, losses = train_step(state, sharded)
                pending.append((global_step, losses))
                if profiling and steps_done == 4:
                    jax.block_until_ready(losses)
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.info('profiler trace written to %s',
                                     self.run_dir / 'profile')

                if global_step % fetch_every == 0:
                    self._fetch_pending(pending, stats)
                if global_step % self.summary_every == 0:
                    self._fetch_pending(pending, stats)
                    self.train_writer.scalars('loss', stats.averages(), global_step)
                    # Rate over steps executed THIS run (steps_done), not
                    # global_step: after a resume the two differ by the
                    # restored step count and global_step/elapsed would
                    # report a wildly inflated then asymptotically decaying
                    # it/s (observed: 12.92 it/s right after a step-4000
                    # resume).
                    rate = steps_done / (time.perf_counter() - t_start)
                    self.logger.info('step %d/%d loss %.4f (%.2f it/s)',
                                     global_step, total_iter,
                                     self._loss_smooth, rate)
                    stats.clear()

                if (val_loader is not None and validate_every > 0
                        and global_step % validate_every == 0):
                    self._run_validation(eval_step, state.params, val_loader,
                                         mesh, global_step, state=state)

                if global_step >= total_iter:
                    done = True
                    break
            epoch += 1
        # Flush the tail through the same fetch path so an end-of-run NaN
        # burst is still reported, then close a profiler window left open by
        # a run shorter than 4 steps.
        self._fetch_pending(pending, stats)
        if profiling:
            jax.profiler.stop_trace()
            self.logger.info('profiler trace written to %s',
                             self.run_dir / 'profile')

        if val_loader is not None:
            self._run_validation(eval_step, state.params, val_loader, mesh,
                                 global_step, state=state)
        self.saver.wait()
        self.logger.info('training done at step %d', global_step)
        return state

    def _fetch_pending(self, pending: list, stats: StatsMeter):
        """Fetch queued device-side loss dicts, accumulate meters + EMA, and
        warn on non-finite losses (update already skipped on-device)."""
        if not pending:
            return
        fetched = jax.device_get([l for _, l in pending])
        for (step_i, _), vals in zip(pending, fetched):
            total = float(vals['total'])
            stats.update_dict({k: float(v) for k, v in vals.items()})
            if self._loss_smooth is None:
                self._loss_smooth = total
            elif np.isfinite(total):
                self._loss_smooth = 0.99 * self._loss_smooth + 0.01 * total
            else:
                self.logger.warning(
                    'non-finite loss at step %d (update skipped on-device)',
                    step_i)
        pending.clear()

    def _run_validation(self, eval_step, params, val_loader, mesh, step,
                        limit_steps: int | None = None, save: bool = True,
                        state=None):
        meter = StatsMeter()
        hists: dict = {}
        for i, batch in enumerate(val_loader):
            if limit_steps is not None and i >= limit_steps:
                break
            sharded = shard_batch(batch, mesh)
            small, losses, metrics = eval_step(params, sharded)
            meter.update_dict({f'loss_{k}': float(v) for k, v in losses.items()})
            # Metrics named *_hist get a tensorboard histogram of their raw
            # values (generic_reg_model.py:137-141); everything else a mean.
            meter.update_dict({k: float(np.asarray(v).mean())
                               for k, v in metrics.items()
                               if not k.endswith('_hist')})
            for k, v in metrics.items():
                if k.endswith('_hist'):
                    hists.setdefault(k, []).append(np.asarray(v).ravel())
            overflow = np.asarray(small.get('pyramid_overflow', 0)).max()
            if overflow > 0:
                self.logger.warning(
                    'pyramid budget overflow: %d voxels dropped at some level '
                    '— recalibrate level_budgets (data/calibrate.py)', overflow)
            rel_of = np.asarray(small.get('rel_overflow', 0)).max()
            if rel_of > 0:
                self.logger.warning(
                    'blocked-search rmax overflow: %d relevant blocks beyond '
                    'the cap (farthest dropped) — raise neighbor_rmax[_pool]',
                    rel_of)
        avg = meter.averages()
        # Label truncated (sanity) passes distinctly: they run only the first
        # nb_sanity_val_steps batches, so their metrics are NOT comparable to
        # the full-set scheduled validations (a resumed run's sanity line at
        # the same step legitimately differs from the pre-crash full line).
        if limit_steps is not None:
            self.logger.info('sanity validation @%d (first %d batches): %s',
                             step, limit_steps, meter)
        else:
            self.logger.info('validation @%d: %s', step, meter)
        self.val_writer.scalars('val', avg, step)
        for k, chunks in hists.items():
            self.val_writer.histogram(f'val/{k}', np.concatenate(chunks), step)
        score = avg.get('reg_success', 0.0)
        if save and state is not None:
            self.saver.save(step, state, score=score)
        return score

    def test(self, model, test_loader: DataLoader, params):
        """No-grad test loop; returns per-pair outputs for the benchmark
        harnesses (trainer.py:216-250 equivalent)."""
        mesh = make_mesh_for_batch(test_loader.batch_size)
        eval_step = make_eval_step(model, self.cfg, mesh=mesh)
        all_outputs = []
        meter = StatsMeter()
        for batch in test_loader:
            sharded = shard_batch(batch, mesh)
            small, losses, metrics = eval_step(params, sharded)
            meter.update_dict({k: float(np.asarray(v).mean())
                               for k, v in metrics.items()})
            all_outputs.append({
                'pose': np.asarray(small['pose']),
                'pose_gt': np.asarray(batch['pose']),
                'metrics': {k: np.asarray(v) for k, v in metrics.items()},
            })
        self.logger.info('test: %s', meter)
        return all_outputs, meter.averages()
