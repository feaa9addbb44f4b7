"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""
import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (the real TPU chip),
# which is slow to compile against and single-device; tests want 8 fake CPUs.
# NOTE: the axon sitecustomize calls jax.config.update('jax_platforms', ...)
# at interpreter start, which overrides the env var — so we must override via
# jax.config too, before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
