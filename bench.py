"""Benchmark: source-rays/second through the full multi-bounce trace.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's examples/test_case.py configuration (5 m parabolic
dish + 4-wall homogenizer + receiver, pillbox sun) at 2**20 rays per batch,
fused bounce loop on one chip, float32. vs_baseline is the ratio against the
driver-defined north star of 100 Mrays/s/chip (BASELINE.json).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _minidish_scene, _sun_bundle
    from tracer_tpu.engine import trace_fused

    n = 1 << 20
    table, _ = _minidish_scene()
    key = jax.random.PRNGKey(0)
    bundle = _sun_bundle(key, n)

    def step(scene, bundle, key):
        final, accum = trace_fused(scene, bundle, key, max_bounces=10,
                                   min_energy=1e-6)
        return accum

    step_j = jax.jit(step)
    # warmup / compile
    accum = jax.block_until_ready(step_j(table, bundle, key))

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        accum = step_j(table, bundle, jax.random.fold_in(key, i))
    jax.block_until_ready(accum)
    dt = (time.perf_counter() - t0) / reps

    mrays = n / dt / 1e6
    print(json.dumps({
        "metric": "minidish_trace_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
