"""Diagnose the split-streaming slowdown (config 6's split_stream extra
measured 0.875 Mrays/s vs 161 on the non-split general path in the same
process). Separates round-count inflation (the loop running to
max_rounds because branches keep re-splitting) from per-round cost
(the overflow machinery's scatters).

Usage: python -m benchmarks.probe_split
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()

from tracer_tpu.engine import trace_streaming
from tracer_tpu.kernels.pallas_intersect import TILE
from tracer_tpu.models.spherical_lens import SphericalLens
from tracer_tpu.scene import Assembly, AssembledObject, Surface, \
    compile_scene
from tracer_tpu import geometry as G, materials as M
from tracer_tpu.sources import disk_bundle


def main(slab_tiles=114, rounds=32):
    slab = slab_tiles * TILE
    total = rounds * slab

    def src(key):
        return disk_bundle(key, slab, center=[0.0, 0.0, 0.5],
                           direction=[0.0, 0.0, -1.0], radius=0.1,
                           ang_range=1e-4, flux=1000.0)

    def scene(single_ray):
        lens = SphericalLens(diameter=0.5, depth=0.02, R1=0.3, R2=-0.3,
                             refr_idx=1.5, single_ray=single_ray)
        f = lens.focal_length()
        rec = Surface(G.round_plate(0.3), M.absorber(one_sided=False),
                      location=[0.0, 0.0, -f], name="rec")
        return compile_scene(Assembly([lens, AssembledObject([rec])]),
                             dtype=jnp.float32)

    for name, single_ray, mr_list in (
            ("nonsplit", True, (100, 400)),
            ("split", False, (50, 100, 200, 400))):
        table, meta = scene(single_ray)
        for mr in mr_list:
            @jax.jit
            def step(key, tab=table, mr=mr):
                return trace_streaming(tab, src, key, total_rays=total,
                                       max_rounds=mr, max_path=20)
            key = jax.random.PRNGKey(66)
            accum, emitted, se = jax.block_until_ready(step(key))
            t0 = time.perf_counter()
            accum, emitted, se = jax.block_until_ready(
                step(jax.random.fold_in(key, 1)))
            dt = time.perf_counter() - t0
            closure = float((accum.absorbed.sum() + accum.escaped
                             + accum.culled + accum.medium
                             + accum.residual - se) / se)
            print(f"{name:9s} max_rounds={mr:4d}  {dt:7.3f}s  "
                  f"{float(emitted) / dt / 1e6:8.2f} Mrays/s  "
                  f"residual={float(accum.residual) / float(se):.2e}  "
                  f"closure={closure:.1e}")


if __name__ == "__main__":
    main()
