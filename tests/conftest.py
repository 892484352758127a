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


# Persistent XLA-CPU compile cache: one full-suite process performs ~80 heavy
# compiles (batched beam/insert programs + 8-device shard_map SPMD); the XLA CPU
# compiler has been observed to SEGFAULT on the late compiles of a long-lived
# process (reproduced twice at the same test; every subset passes standalone).
# Caching compiled executables to disk makes repeat runs skip native compilation
# entirely, and the reordering below puts the heaviest compiles first while the
# process is young.
# The cache dir is keyed by the host's CPU feature fingerprint: containers can
# be re-provisioned onto different host generations between sessions, and
# XLA:CPU AOT executables cached on the old host load with mismatched machine
# features on the new one (observed: "+prefer-no-scatter ... not supported on
# the host machine ... could lead to execution errors such as SIGILL", then a
# segfault mid-suite). A new host silently starts a fresh cache.
import hashlib

_cpu_fp = "generic"
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith("flags"):
                _cpu_fp = hashlib.sha1(_line.encode()).hexdigest()[:10]
                break
except OSError:
    pass
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HNSW_TEST_CACHE",
                                 f"/tmp/hnsw_tpu_test_cache_{_cpu_fp}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    """Run the sharded-mesh tests FIRST: their 8-device shard_map programs are
    the heaviest CPU compiles, and compiling them in a fresh process avoids the
    late-process XLA CPU compiler segfault (see cache note above)."""
    items.sort(key=lambda it: 0 if "test_sharded" in it.nodeid else 1)
