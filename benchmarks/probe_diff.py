"""Probe: differentiable-gradient throughput vs ray-batch size and remat.

Config 9 measures one jitted value_and_grad of the spot-RMS loss (~4
Mrays/s at 262k rays on round-4 capture day). The forward+backward
program is pure jnp (the Pallas kernels have no VJP), so its throughput
is dominated by per-ray work — this probe sweeps the batch size and the
checkpoint (remat) flag to find where the gradient step saturates on
one chip. The scene/loss builder is IMPORTED from the suite
(suite.diff_gradient_step) so the probe always measures the exact
config-9 workload.

Measured history (2026-08-19): before the scatter-free moment/splat
accumulation the step saturated at ~6.2 Mrays/s (both remat settings);
after, 6.44 / 12.41 / 14.6 at 262k / 1M / 4M rays (checkpoint=False)
and 6.66 / 13.02 / 15.31 with checkpoint=True — remat is net-faster
(fewer stored residuals, less HBM traffic). A 16M-ray program fails in
the axon remote compiler with "HTTP 413: length limit exceeded", so 4M
is the practical single-call cap; chunk + accumulate gradients beyond.

Run: python -m benchmarks.probe_diff
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()

from benchmarks.suite import diff_gradient_step  # noqa: E402


def probe(n_rays: int, bounces: int = 3, checkpoint: bool = False,
          reps: int = 5) -> dict:
    step = diff_gradient_step(n_rays, bounces, checkpoint=checkpoint)
    fs = [jnp.asarray(1.7 + 0.01 * i, jnp.float32) for i in range(reps + 1)]
    t0 = time.perf_counter()
    val, g = jax.block_until_ready(step(fs[0]))
    warm = time.perf_counter() - t0
    assert np.isfinite(float(val)) and np.isfinite(float(g))
    best = float("inf")
    for i in range(reps):
        t1 = time.perf_counter()
        jax.block_until_ready(step(fs[i + 1]))
        best = min(best, time.perf_counter() - t1)
    return dict(n_rays=n_rays, bounces=bounces, checkpoint=checkpoint,
                mrays_s=round(n_rays / best / 1e6, 2),
                ms_per_step=round(best * 1e3, 2), warm_s=round(warm, 1),
                loss=round(float(val), 5), grad=round(float(g), 5))


if __name__ == "__main__":
    for ck in (False, True):
        for n in (262_144, 1_048_576, 4_194_304):
            try:
                print(json.dumps(probe(n, checkpoint=ck)))
            except Exception as e:  # OOM etc. — report and continue
                print(json.dumps(dict(n_rays=n, checkpoint=ck,
                                      error=str(e)[:200])))
