"""Benchmark: sustained source-rays/second on the NSTTF heliostat-field
trace (the BASELINE.json north-star workload: 218 heliostats + tower
receiver, Buie sunshape, 10M+ rays) with on-device ray regeneration and
per-block relevancy culling (tracer_tpu/culling.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio against the north star of 100 Mrays/s/chip.
"""
import json
import time

import jax


def main():
    from benchmarks.nsttf import build_scene, make_source_fn
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.kernels.pallas_intersect import TILE

    slab = (1 << 20) // TILE * TILE + TILE   # whole number of ray tiles
    total = 32 * slab   # ~33.6M source rays per measured call
    table, meta, info = build_scene()
    source_fn = make_source_fn(info, slab)
    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)

    def step(key):
        accum, emitted, src_e = trace_streaming(
            table, source_fn, key, total_rays=total, max_rounds=400,
            max_path=8, min_energy=1e-6, culling=culling)
        return accum, emitted, src_e

    step_j = jax.jit(step)
    key = jax.random.PRNGKey(0)
    accum, emitted, src_e = jax.block_until_ready(step_j(key))  # compile+warm

    # physics guard: the benchmark must stay correct while being fast.
    # mirror aperture is ~8.7% of the footprint; projection + blocking give
    # ~6% interception, x0.9 reflectivity minus spillage -> receiver gets
    # ~5.4% of footprint power. Energy must balance.
    import numpy as np
    ab = np.asarray(accum.absorbed)
    se = float(src_e)
    closure = (se - ab.sum() - float(accum.escaped) - float(accum.culled)
               - float(accum.medium) - float(accum.residual)) / se
    rec_frac = float(ab.max()) / se
    assert abs(closure) < 5e-3, f"energy closure broken: {closure}"
    assert 0.035 < rec_frac < 0.08, f"receiver fraction off: {rec_frac}"

    # per-rep timing, best-of-N: the TPU tunnel adds high-variance latency
    reps = 6
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(step_j(jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)

    mrays = total / best / 1e6
    print(json.dumps({
        "metric": "nsttf_trace_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
