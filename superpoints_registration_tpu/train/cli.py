"""CLI entry points: training and evaluation.

Mirrors the reference entry points (src/train.py:39-54, src/test.py:14-35):

    python -m superpoints_registration_tpu.train.cli --config <yaml> [--dev]
    python -m superpoints_registration_tpu.train.cli --config <yaml> \
        --test --benchmark 3DMatch --resume <ckpt_dir>
"""
from __future__ import annotations

import argparse
import pathlib

from ..config import load_config, load_builtin
from ..data.loader import get_dataloader
from ..models import build_model
from ..utils.logging_utils import prepare_logger, prepare_run_dir, snapshot_config
from .trainer import Trainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='TPU superpoint registration')
    p.add_argument('--config', required=True,
                   help='YAML config path or builtin name (e.g. regtr_3dmatch)')
    p.add_argument('--logdir', default='logs')
    p.add_argument('--name', default=None)
    p.add_argument('--dev', action='store_true', help='fixed dev run dir')
    p.add_argument('--resume', default=None, help='checkpoint dir to resume')
    p.add_argument('--warm_start', default=None,
                   help='checkpoint dir to initialize params from (optimizer '
                        'state, LR schedule and step counter start fresh — '
                        'unlike --resume)')
    p.add_argument('--niter', type=int, default=None)
    p.add_argument('--validate_every', type=int, default=-1)
    p.add_argument('--nb_sanity_val_steps', type=int, default=2)
    p.add_argument('--summary_every', type=int, default=200)
    p.add_argument('--test', action='store_true', help='run evaluation only')
    p.add_argument('--debug', action='store_true',
                   help='enable NaN checking (reference --debug anomaly mode)')
    p.add_argument('--profile', action='store_true',
                   help='capture a jax.profiler trace of the first training / '
                        'test steps into <run_dir>/profile (view with '
                        'tensorboard or xprof; stages are named_scope-tagged). '
                        'Replaces the reference manual stage timers '
                        '(qk_regtr_full.py:150-290).')
    p.add_argument('--dgr', action='store_true',
                   help='with --test on 3DMatch: also report the DGR-protocol '
                        'success rate (RRE < 15 deg, RTE < 0.3 m; '
                        'benchmark_3dmatch.py:105-176) next to Predator recall')
    p.add_argument('--benchmark', default=None,
                   choices=[None, '3DMatch', '3DLoMatch', 'ModelNet', 'ModelLoNet',
                            'Kitti'],
                   help='benchmark preset for --test (src/test.py:61-68)')
    return p.parse_args(argv)


def apply_benchmark_preset(cfg, benchmark):
    """Benchmark-specific config tweaks (src/test.py:61-68)."""
    if benchmark in ('3DMatch', '3DLoMatch'):
        cfg.benchmark = benchmark
    elif benchmark == 'ModelNet':
        cfg.partial = [0.7, 0.7]
        cfg.benchmark = benchmark
    elif benchmark == 'ModelLoNet':
        cfg.partial = [0.5, 0.5]
        cfg.benchmark = benchmark
    elif benchmark == 'Kitti':
        cfg.benchmark = benchmark
    return cfg


def _enable_compile_cache():
    """Persistent XLA compilation cache (measured cross-process: 0.9 s ->
    0.06 s on the axon backend). TPU compiles run 1-10 min through the
    remote-compiler tunnel, so re-runs of the same config (test sweeps,
    ablation variants, resumed training) get their programs back for free.
    Opt out / relocate with JAX_COMPILATION_CACHE_DIR."""
    import os
    import pathlib as _pl
    default = str(_pl.Path(__file__).resolve().parents[2] / '.jax_cache')
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR', default)
    if cache and cache != '0':
        import jax
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main(argv=None):
    args = parse_args(argv)
    import os
    _enable_compile_cache()
    if 'cpu' in os.environ.get('JAX_PLATFORMS', ''):
        # Honor an explicit CPU request (smoke runs, virtual multi-device
        # meshes): the axon sitecustomize force-registers the TPU backend
        # via jax.config.update, which beats the env var.
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if args.debug:
        import jax
        jax.config.update('jax_debug_nans', True)
    cfg_path = pathlib.Path(args.config)
    cfg = load_config(cfg_path) if cfg_path.exists() else load_builtin(args.config)
    if args.benchmark:
        cfg = apply_benchmark_preset(cfg, args.benchmark)
    if args.dgr:
        cfg.dgr_protocol = True

    overrides_installed = False
    if args.resume:
        # Checkpoints converted from the reference carry the reference's
        # kernel-point dispositions; they must be installed before the model
        # is traced (utils/convert_reference.py).
        from ..utils.convert_reference import maybe_install_kernel_overrides
        overrides_installed = maybe_install_kernel_overrides(args.resume)
        if overrides_installed:
            print('installed reference kernel-point dispositions from '
                  'converted checkpoint')

    name = args.name or cfg.get('expt_name', 'run')
    run_dir = prepare_run_dir(args.logdir, cfg.get('dataset', 'unknown'), name,
                              dev=args.dev)
    if overrides_installed and not args.test:
        # Fine-tuning a converted checkpoint: the new run's own checkpoints
        # must keep carrying the dispositions, or a later --resume of them
        # would silently pair the weights with generator dispositions.
        import shutil
        src_npz = pathlib.Path(args.resume)
        for cand in (src_npz / 'kernel_points.npz',
                     src_npz.parent / 'kernel_points.npz'):
            if cand.exists():
                shutil.copy(cand, run_dir / 'kernel_points.npz')
                break
    logger = prepare_logger(run_dir)
    snapshot_config(run_dir, cfg)
    logger.info('run dir: %s', run_dir)

    model = build_model(cfg.get('model', 'regtr.RegTR'), cfg)
    trainer = Trainer(cfg, run_dir, niter=args.niter,
                      validate_every=args.validate_every,
                      nb_sanity_val_steps=args.nb_sanity_val_steps,
                      summary_every=args.summary_every, logger=logger,
                      profile=args.profile)

    if args.test:
        import jax
        from ..parallel.train_step import TrainState
        from .checkpoint import CheckpointManager
        from .optim import make_optimizer
        test_loader = get_dataloader(cfg, 'test')
        first = next(iter(test_loader))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), first)
        if args.resume:
            template = TrainState.create(params, make_optimizer(cfg))
            state, step = CheckpointManager(args.resume).restore(template)
            params = state.params
            logger.info('loaded checkpoint step %d', step)
        else:
            logger.warning('NO checkpoint given — evaluating random weights')
        from .evaluate import run_test
        return run_test(cfg, model, params, test_loader, run_dir, logger)

    train_loader = get_dataloader(cfg, 'train')
    val_loader = get_dataloader(cfg, 'val')
    trainer.fit(model, train_loader, val_loader, resume=args.resume,
                warm_start=args.warm_start)


if __name__ == '__main__':
    main()
