"""Test configuration: multi-chip logic is exercised on a virtual 8-device CPU mesh
(the analog of testing 'multi-node without a real cluster' — SURVEY.md §4), so env
vars must be set before jax is imported anywhere."""

import os

# The ambient environment injects an `axon` TPU plugin whose register() FORCES
# jax_platforms="axon,cpu" (sitecustomize on PYTHONPATH), so the JAX_PLATFORMS env var
# alone is not enough — we must also override the config after import (below).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
