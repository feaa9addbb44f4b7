"""Optimizer + LR schedule construction (optax).

Mirrors the reference's configure_optimizers (src/models/generic_reg_model.py:
46-80: AdamW/Adam, StepLR or warmup-exponential, grad-clip-by-norm applied in
the trainer src/trainer.py:124-125,146-147).
"""
from __future__ import annotations

import optax


def make_schedule(cfg):
    """LR schedule from config: 'step', 'warmup', or 'none'."""
    base_lr = float(cfg.get('base_lr', 1e-4))
    sched = cfg.get('scheduler', 'none')
    if sched in (None, 'none'):
        return base_lr
    if sched == 'step':
        step_size, gamma = cfg.scheduler_param[0], cfg.scheduler_param[1]
        # StepLR: lr * gamma^(floor(step / step_size))
        return lambda step: base_lr * (gamma ** (step // step_size))
    if sched == 'warmup':
        # WarmUpScheduler (src/models/scheduler/warmup.py:4-63):
        # linear 0->base_lr over warmup_steps, then exponential decay with
        # gamma = exp(log(decay_factor) / num_decay_steps).
        params = cfg.scheduler_param
        warmup_steps = params[0]
        if len(params) >= 3:
            import math
            gamma = math.exp(math.log(params[2]) / params[1])
        else:
            gamma = 1.0

        def schedule(step):
            import jax.numpy as jnp
            warm = jnp.minimum(step / max(warmup_steps, 1), 1.0) * base_lr
            decay = (gamma ** (step - warmup_steps)) * base_lr
            return jnp.where(step < warmup_steps, warm, decay)
        return schedule
    raise ValueError(f"unknown scheduler '{sched}'")


def make_optimizer(cfg) -> optax.GradientTransformation:
    """optax chain: grad clip by global norm -> Adam(W) with schedule."""
    schedule = make_schedule(cfg)
    wd = float(cfg.get('weight_decay', 0.0))
    name = cfg.get('optimizer', 'AdamW')
    if name == 'AdamW':
        opt = optax.adamw(schedule, weight_decay=wd)
    elif name == 'Adam':
        # torch Adam's weight_decay is L2-into-gradient, not decoupled.
        opt = optax.chain(optax.add_decayed_weights(wd) if wd else optax.identity(),
                          optax.adam(schedule))
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    clip = float(cfg.get('grad_clip', 0.0))
    if clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt
