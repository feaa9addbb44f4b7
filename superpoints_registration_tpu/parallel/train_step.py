"""SPMD train / eval steps: one jitted XLA program over the device mesh.

The reference's per-step host loop (forward, backward, NCCL all-reduce via
DDP, clip, optimizer step — src/trainer.py:101-148) becomes a single jitted
function: batch sharded over the 'data' mesh axis, params/optimizer state
replicated, gradient psum inserted by XLA. Donated arguments keep params and
optimizer state in-place in HBM.

A non-finite loss skips the parameter update on-device (the reference merely
warns and backprops anyway, src/trainer.py:156-164).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..train.metrics import pose_metrics
from .mesh import batch_sharding, replicated


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32

    @staticmethod
    def create(params, tx: optax.GradientTransformation) -> "TrainState":
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))


def make_train_step(model, tx: optax.GradientTransformation, mesh=None,
                    skip_nonfinite: bool = True):
    """Build the jitted train step: (state, batch) -> (state, losses)."""

    def train_step(state: TrainState, batch: dict):
        def loss_fn(p):
            out = model.apply(p, batch)
            return out['losses']['total'], out['losses']

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if skip_nonfinite:
            ok = jnp.isfinite(loss)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, state.params)
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old) if new.shape == old.shape
                else new, new_opt_state, state.opt_state)

        new_state = TrainState(params=new_params, opt_state=new_opt_state,
                               step=state.step + 1)
        return new_state, losses

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(model, cfg, mesh=None):
    """Build the jitted eval step: (params, batch) -> (outputs, losses, metrics)."""
    thresh_rot = float(cfg.get('reg_success_thresh_rot', 10.0))
    thresh_trans = float(cfg.get('reg_success_thresh_trans', 0.1))

    def eval_step(params, batch):
        out = model.apply(params, batch)
        metrics = pose_metrics(out['pose'], batch['pose'], thresh_rot, thresh_trans)
        small = {
            'pose': out['pose'],
            'src_overlap': out['src_overlap'],
            'tgt_overlap': out['tgt_overlap'],
            'corr_weight': out['corr_weight'],
            'pyramid_overflow': jnp.broadcast_to(
                out['pyramid_overflow'], (out['pose'].shape[0],)
                + out['pyramid_overflow'].shape),
            'rel_overflow': jnp.broadcast_to(
                out['rel_overflow'], (out['pose'].shape[0],)),
        }
        return small, out['losses'], metrics

    if mesh is None:
        return jax.jit(eval_step)

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(rep, data),
                   out_shardings=(data, rep, data))
