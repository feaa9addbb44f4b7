#!/bin/bash
# Round-5 end-game: executed in order once the v7 training stops.
# Usage: scripts/round5_endgame.sh <phase>
set -x
cd /root/repo

PHASE=${1:?phase required: eval|ablation|bench|kitti|modelnet}

if [ "$PHASE" = eval ]; then
  timeout 2400 python -m superpoints_registration_tpu.train.cli \
    --config regtr_synth3dmatch_v7 --test --benchmark 3DMatch \
    --resume logs_synth_v7/devdata/ckpt \
    --logdir logs_eval_v7 --name bench_3dmatch 2>&1 | tail -15
  timeout 1800 python -m superpoints_registration_tpu.train.cli \
    --config regtr_synth3dmatch_v7 --test --benchmark 3DLoMatch \
    --resume logs_synth_v7/devdata/ckpt \
    --logdir logs_eval_v7 --name bench_3dlomatch 2>&1 | tail -15
fi

if [ "$PHASE" = ablation ]; then
  # Promotion-relevant subset (throughput levers) on the round-5 checkpoint.
  timeout 4000 python - << 'EOF' 2>&1 | tail -30
import logging, pathlib
logging.basicConfig(level=logging.INFO)
from superpoints_registration_tpu.train.cli import _enable_compile_cache
_enable_compile_cache()
from superpoints_registration_tpu.config import load_builtin
from superpoints_registration_tpu.train.ablation import VARIANTS, run
keep = ('baseline', 'exact neighbor', 'recall 0.90', 'recall 0.85',
        'tightened budgets', 'promoted stack (recall 0.90 + tightened budgets)',
        'neighborhood limits', 'f32 gather', 'f32 transformer')
subset = [v for v in VARIANTS if any(k in v[0] for k in keep)]
cfg = load_builtin('regtr_synth3dmatch_v7')
run(cfg, 'logs_synth_v7/devdata/ckpt', 'docs/ABLATION.md',
    logging.getLogger('ablation'), variants=subset)
EOF
fi

if [ "$PHASE" = bench ]; then
  timeout 1800 python bench.py
  BENCH_EXACT=0 BENCH_RECALL=0.90 BENCH_BUDGETS=15360,4608,1440 \
    timeout 1800 python bench.py
  BENCH_EXACT=0 BENCH_RECALL=0.90 BENCH_BUDGETS=15360,4608,1440 \
    BENCH_LIMITS=20,25,28 timeout 1800 python bench.py
fi

if [ "$PHASE" = kitti ]; then
  timeout 3000 python -m superpoints_registration_tpu.train.cli \
    --config regtr_kitti --logdir logs_kitti --dev \
    --niter 1500 --validate_every 500 2>&1 | tail -4
  timeout 1200 python -m superpoints_registration_tpu.train.cli \
    --config regtr_kitti --test --benchmark Kitti \
    --resume logs_kitti/devdata/ckpt \
    --logdir logs_kitti --name eval 2>&1 | tail -8
fi

if [ "$PHASE" = modelnet ]; then
  timeout 2000 python -m superpoints_registration_tpu.train.cli \
    --config regtr_modelnet --logdir logs_modelnet --dev \
    --niter 3000 --validate_every 750 2>&1 | tail -4
  timeout 1200 python -m superpoints_registration_tpu.train.cli \
    --config regtr_modelnet --test --benchmark ModelNet \
    --resume logs_modelnet/devdata/ckpt \
    --logdir logs_modelnet --name eval 2>&1 | tail -12
fi
