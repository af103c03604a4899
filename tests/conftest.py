"""Test harness: force the CPU backend with 8 virtual devices so sharding
paths are exercised without TPU hardware.

This environment pre-sets JAX_PLATFORMS=axon (a real TPU behind a relay)
and registers an axon PJRT plugin in every interpreter via sitecustomize
(PYTHONPATH=/root/.axon_site).  Initializing that backend blocks until
the TPU grant is free — which stalls even pure-CPU runs whenever any
other process holds the chip.  So: switch jax to cpu via config (the env
var was already read at import) and drop the axon factory so backend
discovery never touches it.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: repeated test runs skip XLA CPU compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_agv")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
