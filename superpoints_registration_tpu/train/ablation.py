"""Approximation-stack ablation: trained recall under each inference variant.

Quantifies the accuracy cost of every TPU-side approximation against the
registration-recall protocol (VERDICT round-1 item 3): exact top_k vs
approx_max_k (0.90/0.95/0.99), bf16 vs f32 gather tables, bf16 vs f32
transformer compute. Each variant re-runs the full test protocol
(est.log -> benchmark/predator.py) with the SAME trained checkpoint; only
the inference-time configuration changes.

Usage:
    python -m superpoints_registration_tpu.train.ablation \
        --config regtr_synth3dmatch --resume <ckpt_dir> \
        [--out docs/ABLATION.md]
"""
from __future__ import annotations

import argparse
import pathlib
import time

VARIANTS = [
    ('baseline (approx 0.95, bf16 gather, bf16 transformer)', {}),
    ('exact neighbor top-k', {'neighbor_exact': True}),
    ('approx_max_k recall 0.90', {'neighbor_recall': 0.90}),
    ('approx_max_k recall 0.85', {'neighbor_recall': 0.85}),
    ('approx_max_k recall 0.99', {'neighbor_recall': 0.99}),
    ('f32 gather tables', {'gather_dtype': 'float32'}),
    ('f32 transformer compute', {'transformer_compute_dtype': 'float32'}),
    ('blocked neighbor search (rmax 32)', {'neighbor_search': 'blocked'}),
    ('lane neighbor search (pallas, cpl=2, exact-over-candidates)',
     {'neighbor_search': 'lane', 'neighbor_exact': True}),
    ('lane neighbor search (cpl=1)',
     {'neighbor_search': 'lane', 'neighbor_lane_cpl': 1,
      'neighbor_exact': True}),
    ('lane_packed neighbor search (key-domain approx select)',
     {'neighbor_search': 'lane_packed'}),
    # Windowed-DMA pallas gather (ops/pallas/gather.py): ~2% of far
    # neighbors drop to shadow; its accuracy cost gates flipping
    # gather_impl's default (VERDICT r4 item 3).
    ('pallas windowed-DMA gather', {'gather_impl': 'pallas'}),
    ('promoted stack (recall 0.90 + pallas gather)',
     {'neighbor_recall': 0.90, 'gather_impl': 'pallas'}),
    # Tightened L0 operating point (VERDICT r4 weak-1d): eval-time budget
    # reduction drops only pad/overflow rows; its recall cost gates the
    # BENCH_BUDGETS promotion. Scaled to this corpus's trained budgets
    # (16384/5760/1792 -> ~93.75% at L0).
    ('tightened budgets (15360/5400/1680)',
     {'level_budgets': [15360, 5400, 1680]}),
    # The round-5 promotion candidate (VERDICT r4 item 2): the two levers
    # that measured FASTER end-to-end (docs/PERF.md round-5 table: +16.3%
    # combined) — gated on THIS row staying inside the 0.5% guardrail.
    ('promoted stack (recall 0.90 + tightened budgets)',
     {'neighbor_recall': 0.90, 'level_budgets': [15360, 5400, 1680]}),
    # K-cap reduction below the calibrated p80 (linear lever on the gather
    # stage, docs/PERF.md round-5): drops the farthest ~p60-p80 neighbors.
    ('neighborhood limits 20/25/28 (below-p80 K cap)',
     {'neighborhood_limits': [20, 25, 28]}),
    # Pose-solver variants (all eval-time switches, qk_regtr_full.py options):
    ('kabsch on hard correspondences (no sinkhorn)', {'use_sinkhorn': False}),
    ('sinkhorn + LGR refinement', {'use_lgr': True}),
    ('kabsch + LGR', {'use_sinkhorn': False, 'use_lgr': True}),
]


def run(cfg, resume, out_path, logger, variants=VARIANTS):
    import jax
    import numpy as np
    from ..data.loader import get_dataloader
    from ..models import build_model
    from ..parallel.train_step import TrainState
    from .checkpoint import CheckpointManager
    from .optim import make_optimizer
    from ..utils.convert_reference import maybe_install_kernel_overrides

    # Reference-converted checkpoints carry their kernel dispositions; they
    # must be installed before any variant's model traces.
    if maybe_install_kernel_overrides(resume):
        logger.info('installed reference kernel-point dispositions')

    rows = []
    params_cache = {}
    for name, overrides in variants:
        vcfg = cfg.copy()
        vcfg.update(overrides)
        model = build_model(vcfg.get('model', 'regtr.RegTR'), vcfg)
        test_loader = get_dataloader(vcfg, 'test')
        if 'params' not in params_cache:
            first = next(iter(test_loader))
            init = jax.jit(model.init)(jax.random.PRNGKey(0), first)
            template = TrainState.create(init, make_optimizer(vcfg))
            state, step = CheckpointManager(resume).restore(template)
            params_cache['params'] = state.params
            params_cache['step'] = step
            logger.info('checkpoint step %d', step)
        run_dir = pathlib.Path(out_path).parent / 'ablation_runs' / \
            name.replace(' ', '_').replace('(', '').replace(')', '').replace(',', '')
        run_dir.mkdir(parents=True, exist_ok=True)
        from .evaluate import run_test
        t0 = time.perf_counter()
        results = run_test(vcfg, model, params_cache['params'], test_loader,
                           str(run_dir), logger)
        dt = time.perf_counter() - t0
        rows.append((name, results.get('registration_recall', float('nan')),
                     results.get('rot_err_deg_mean', float('nan')),
                     results.get('trans_err_mean', float('nan')), dt))
        logger.info('%s -> recall %.4f', name, rows[-1][1])

    lines = [
        '# Approximation-stack ablation',
        '',
        f'Checkpoint: `{resume}` (step {params_cache.get("step", "?")}), '
        f'dataset `{cfg.get("dataset")}` benchmark '
        f'`{cfg.get("benchmark", "3DMatch")}` — registration recall via '
        'the Predator protocol (benchmark/predator.py). Every variant is the '
        'SAME weights; only inference-time numerics change.',
        '',
        '| Variant | recall | mean RRE (deg) | mean RTE (m) | eval s |',
        '|---|---|---|---|---|',
    ]
    base = rows[0][1]
    for name, recall, rre, rte, dt in rows:
        delta = '' if np.isnan(recall) else f' ({recall - base:+.4f})'
        lines.append(f'| {name} | {recall:.4f}{delta} | {rre:.3f} | '
                     f'{rte:.4f} | {dt:.0f} |')
    lines.append('')
    lines.append('Guardrail (SURVEY §6 / BASELINE.md): any variant costing '
                 '>0.5% recall must not be a default.')
    pathlib.Path(out_path).write_text('\n'.join(lines) + '\n')
    logger.info('wrote %s', out_path)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--config', required=True)
    p.add_argument('--resume', required=True)
    p.add_argument('--out', default='docs/ABLATION.md')
    p.add_argument('--only', default=None,
                   help='run only variants whose name contains this substring '
                        '(baseline always runs: deltas need it)')
    args = p.parse_args(argv)

    import logging
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger('ablation')
    from .cli import _enable_compile_cache
    _enable_compile_cache()
    from ..config import load_builtin, load_config
    cfg_path = pathlib.Path(args.config)
    cfg = (load_config(cfg_path) if cfg_path.exists()
           else load_builtin(args.config))
    variants = VARIANTS
    if args.only:
        variants = [VARIANTS[0]] + [v for v in VARIANTS[1:]
                                    if args.only in v[0]]
    run(cfg, args.resume, args.out, logger, variants=variants)


if __name__ == '__main__':
    main()
