"""Benchmark: banded seed-extend DP kernel throughput (DP cell updates/s).

This is the north-star hot loop (BASELINE.md: "DP cell updates/s ...
speed-of-light per chip") — the compute core that replaces the
reference's mecat2ref aligner.

Prints ONE JSON line:
    {"metric": "dp_cell_updates_per_s", "value": N, "unit": "cells/s",
     "vs_baseline": R}

vs_baseline: the reference publishes no numbers (BASELINE.md), and its
aligner binaries are absent submodules, so the operational baseline is
the same kernel lowered by XLA to this host's CPU, scaled by 8x to
approximate the reference's 16-thread operating point (this host has 2
vCPUs).  That makes vs_baseline = TPU cells/s / (8 * XLA-CPU cells/s).
"""

import json
import os
import time

import numpy as np


def make_inputs(rng, B, NQ, W):
    NT = NQ + 2 * W
    q = rng.integers(0, 4, (B, NQ)).astype(np.uint8)
    t = rng.integers(0, 4, (B, NT)).astype(np.uint8)
    # plant alignments with 10% noise so the adaptive band does real work
    noise = rng.random((B, NQ)) < 0.1
    planted = np.where(noise, rng.integers(0, 4, (B, NQ)).astype(np.uint8),
                       q)
    t[:, W:W + NQ] = planted
    qlen = np.full(B, NQ, np.int32)
    tlen = np.full(B, NT, np.int32)
    c0 = np.full(B, W, np.int32)
    return q, qlen, t, tlen, c0


def measure(device, B, NQ, W, iters=5):
    import jax
    from aligngraph2_tpu.ops.banded_dp import banded_align

    rng = np.random.default_rng(0)
    args = [jax.device_put(a, device) for a in make_inputs(rng, B, NQ, W)]

    def run():
        res = banded_align(*args, W=W)
        res.score.block_until_ready()
        return res

    run()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    cells = B * NQ * W
    return cells / dt


def _cpu_baseline():
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import measure\n"
        "import jax\n"
        "print('RATE', measure(jax.devices()[0], B=4, NQ=1024, W=256, "
        "iters=2))\n" % os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=900)
        for line in out.stdout.splitlines():
            if line.startswith("RATE "):
                return float(line.split()[1])
    except (subprocess.TimeoutExpired, OSError):
        pass
    return None


def main():
    import jax

    tpu_devs = [d for d in jax.devices() if d.platform != "cpu"]
    cpu_devs = jax.devices("cpu") if not tpu_devs else None
    if tpu_devs:
        dev = tpu_devs[0]
        rate = measure(dev, B=128, NQ=8192, W=256, iters=5)
    else:
        dev = jax.devices()[0]
        rate = measure(dev, B=16, NQ=2048, W=256, iters=3)

    # CPU baseline (small shape, normalized per cell), scaled to the
    # reference's 16 threads from this host's 2 vCPUs.  Run in a clean
    # subprocess: the axon plugin registered in THIS process stalls CPU
    # compiles (see tests/conftest.py).
    cpu_rate = _cpu_baseline()
    vs = rate / (8 * cpu_rate) if cpu_rate else None

    print(json.dumps({
        "metric": "dp_cell_updates_per_s",
        "value": rate,
        "unit": "cells/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
