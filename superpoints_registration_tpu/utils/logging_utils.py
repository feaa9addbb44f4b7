"""Run-directory + logger setup and TensorBoard summaries.

Mirrors the reference's observability conventions (src/cvhelpers/misc.py:
20-117): timestamped run dir logs/<dataset>/<datetime>_<name>, a file+stream
logger, a config snapshot, and git SHA provenance. TensorBoard writing uses
torch.utils.tensorboard (torch-cpu is available) and degrades to a no-op when
unavailable.
"""
from __future__ import annotations

import datetime
import json
import logging
import pathlib
import subprocess
import sys


def prepare_run_dir(base: str, dataset: str, name: str, dev: bool = False) -> pathlib.Path:
    if dev:
        run_dir = pathlib.Path(base) / 'devdata'
    else:
        ts = datetime.datetime.now().strftime('%y%m%d_%H%M%S')
        run_dir = pathlib.Path(base) / dataset / f'{ts}_{name}'
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def prepare_logger(run_dir: pathlib.Path, name: str = 'spr') -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter('%(asctime)s %(levelname)s %(name)s: %(message)s')
    stream = logging.StreamHandler(sys.stdout)
    stream.setFormatter(fmt)
    logger.addHandler(stream)
    fileh = logging.FileHandler(run_dir / 'log.txt')
    fileh.setFormatter(fmt)
    logger.addHandler(fileh)
    logger.propagate = False

    # Git provenance snapshot (cvhelpers/misc.py:20-44 equivalent).
    try:
        sha = subprocess.run(['git', 'rev-parse', 'HEAD'], capture_output=True,
                             text=True, timeout=5).stdout.strip()
        if sha:
            logger.info('git sha: %s', sha)
            (run_dir / 'git_sha.txt').write_text(sha + '\n')
    except Exception:
        pass
    return logger


def snapshot_config(run_dir: pathlib.Path, cfg: dict):
    with open(run_dir / 'config.json', 'w') as f:
        json.dump({k: v for k, v in dict(cfg).items()}, f, indent=2, default=str)


class SummaryWriterWrapper:
    """TensorBoard writer that no-ops when tensorboard isn't importable."""

    def __init__(self, logdir):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(str(logdir), flush_secs=10)
        except Exception:
            self._w = None

    def scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, prefix, d, step):
        for k, v in d.items():
            self.scalar(f'{prefix}/{k}', v, step)

    def histogram(self, tag, values, step):
        if self._w is not None:
            self._w.add_histogram(tag, values, step)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()
