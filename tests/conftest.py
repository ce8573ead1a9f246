"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
code paths are exercised without TPU hardware.

Note: the axon TPU plugin (sitecustomize) forces ``jax_platforms=axon,cpu``
via ``jax.config.update`` at interpreter start, so setting the env var is not
enough — we must override the config after importing jax and before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
