"""Checkpoint management (orbax) with best-metric retention.

TPU-native equivalent of the reference's CheckPointManager
(src/cvhelpers/torch_helpers.py:98-242): keeps the last `max_to_keep`
checkpoints, retains the best-by-score one, saves optimizer state + step,
and can resolve "the best checkpoint in a directory" on restore. Async
orbax saves overlap checkpoint IO with training.
"""
from __future__ import annotations

import pathlib
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 6,
                 keep_period: int | None = None):
        directory = pathlib.Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_period,
            best_fn=lambda metrics: metrics.get('score', float('-inf')),
            best_mode='max',
            create=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)
        self.directory = directory

    def save(self, step: int, state: Any, score: float | None = None):
        """Save train state (params + opt state + step) with its score."""
        metrics = {'score': float(score)} if score is not None else {'score': float('-inf')}
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)

    def restore(self, template: Any, step: int | None = None) -> tuple:
        """Restore (state, step). step=None -> best available, else latest."""
        if step is None:
            step = self._mgr.best_step()
            if step is None:
                step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state, step

    def latest_step(self):
        return self._mgr.latest_step()

    def best_step(self):
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
