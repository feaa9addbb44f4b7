#!/bin/bash
# Round-5 chip-time runbook: executes the judged deliverables in priority
# order once the v6 retrain has converged and the chip is free.
# Each phase is independently resumable; run phases by hand if preferred.
set -x
cd /root/repo

PHASE=${1:-all}

if [ "$PHASE" = all ] || [ "$PHASE" = eval ]; then
  # 1. Headline recall tables (VERDICT r4 next-1).
  timeout 3600 python -m superpoints_registration_tpu.train.cli \
    --config regtr_synth3dmatch --test --benchmark 3DMatch \
    --resume logs_synth_v6/devdata/ckpt \
    --logdir logs_eval_v6 --name bench_3dmatch 2>&1 | tail -30
  timeout 3600 python -m superpoints_registration_tpu.train.cli \
    --config regtr_synth3dmatch --test --benchmark 3DLoMatch \
    --resume logs_synth_v6/devdata/ckpt \
    --logdir logs_eval_v6 --name bench_3dlomatch 2>&1 | tail -30
fi

if [ "$PHASE" = all ] || [ "$PHASE" = ablation ]; then
  # 2. Approximation-stack ablation on the converged ckpt (VERDICT r4 next-2).
  timeout 7200 python -m superpoints_registration_tpu.train.ablation \
    --config regtr_synth3dmatch --resume logs_synth_v6/devdata/ckpt \
    --out docs/ABLATION.md 2>&1 | tail -40
fi

if [ "$PHASE" = gather ]; then
  # 3. Windowed-gather fault rematch (VERDICT r4 next-3) — run by hand:
  timeout 1200 python docs/pallas_fault_repro.py
fi

if [ "$PHASE" = bench ]; then
  # 4. Throughput levers (VERDICT r4 next-4) — run individually:
  timeout 1800 python bench.py                       # baseline
  BENCH_RECALL=0.90 timeout 1800 python bench.py     # promoted recall
  BENCH_GATHER=pallas timeout 1800 python bench.py   # windowed gather
  BENCH_BUDGETS=15360,4608,1440 timeout 1800 python bench.py
  BENCH_PAIRS=16 timeout 1800 python bench.py        # batch-16 regression
fi

if [ "$PHASE" = kitti ]; then
  # 5. KITTI end-to-end learning (VERDICT r4 next-5). ~1 it/s => ~1.5 h.
  timeout 10000 python -m superpoints_registration_tpu.train.cli \
    --config regtr_kitti --logdir logs_kitti --dev \
    --niter 5000 --validate_every 500 2>&1 | tail -5
  timeout 3600 python -m superpoints_registration_tpu.train.cli \
    --config regtr_kitti --test --benchmark Kitti \
    --resume logs_kitti/devdata/ckpt \
    --logdir logs_kitti --name eval 2>&1 | tail -20
fi

if [ "$PHASE" = modelnet ]; then
  # 6. ModelNet past smoke scale (VERDICT r4 next-6). ~3 it/s => ~40 min.
  timeout 10000 python -m superpoints_registration_tpu.train.cli \
    --config regtr_modelnet --logdir logs_modelnet --dev \
    --niter 8000 --validate_every 800 2>&1 | tail -5
  timeout 3600 python -m superpoints_registration_tpu.train.cli \
    --config regtr_modelnet --test --benchmark ModelNet \
    --resume logs_modelnet/devdata/ckpt \
    --logdir logs_modelnet --name eval 2>&1 | tail -30
fi
