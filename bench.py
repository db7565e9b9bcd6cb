"""Benchmark: sustained source-rays/second through the full multi-bounce
trace with on-device ray regeneration (streaming wavefront).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's examples/test_case.py configuration (5 m parabolic
dish + 4-wall homogenizer + receiver, pillbox sun), 1M-ray slab, 16M source
rays per measured call, fused bounce loop on one chip, float32. vs_baseline
is the ratio against the driver-defined north star of 100 Mrays/s/chip
(BASELINE.json).
"""
import json
import math
import time

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _minidish_scene
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.sources import disk_bundle

    slab = 1 << 20
    total = 16 * slab
    table, _ = _minidish_scene()
    x = -1.0 / math.sqrt(2.0)

    def source_fn(key):
        return disk_bundle(key, slab, center=[0.0, 7.0, 7.0],
                           direction=[0.0, x, x], radius=3.0,
                           ang_range=0.005, flux=1000.0)

    def step(scene, key):
        accum, emitted, src_e = trace_streaming(
            scene, source_fn, key, total_rays=total, min_energy=1e-6)
        return accum.escaped, emitted

    step_j = jax.jit(step)
    key = jax.random.PRNGKey(0)
    jax.block_until_ready(step_j(table, key))  # compile + warm

    reps = 4
    t0 = time.perf_counter()
    outs = [step_j(table, jax.random.fold_in(key, i)) for i in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps

    mrays = total / dt / 1e6
    print(json.dumps({
        "metric": "minidish_trace_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
