"""Run a repo script pinned to the CPU backend.

Usage: python tools_cpu_run.py <script.py> [args...]

The axon TPU plugin registered via sitecustomize blocks interpreter
startup while ANY other process holds the chip, so CPU-only side runs
(e.g. bench_quality group triage while a scale run owns the TPU) must
drop the backend factory before the first jax use — exactly what
tests/conftest.py does for the suite.
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

if __name__ == "__main__":
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    runpy.run_path(script, run_name="__main__")
