"""Component-level timing of the split-streaming round: which of the
~50 ms/round (probe_split.py) goes to the jnp bounce (split scenes are
excluded from the fused Pallas kernel), the overflow placement
(cumsum + gather/scatter), or the merge. Times each piece jitted and
block_until_ready'd on representative data.

Usage: python -m benchmarks.probe_split2
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()

from tracer_tpu.engine import _bounce_step, TraceAccum
from tracer_tpu.kernels.pallas_intersect import TILE
from tracer_tpu.models.spherical_lens import SphericalLens
from tracer_tpu.scene import Assembly, AssembledObject, Surface, \
    compile_scene
from tracer_tpu import geometry as G, materials as M
from tracer_tpu.sources import disk_bundle


def bench(tag, fn, *args, reps=6):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:34s} {best * 1e3:9.3f} ms")
    return best


def main(slab_tiles=114):
    n = slab_tiles * TILE
    key = jax.random.PRNGKey(0)
    bundle = disk_bundle(key, n, center=[0.0, 0.0, 0.5],
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

    t_ns, _ = scene(True)
    t_sp, _ = scene(False)

    accum = TraceAccum.zeros(t_ns.num_rows, dtype=jnp.float32)

    def bounce(tab, split_mode, b, k):
        bu, ac, rec = _bounce_step(tab, b, accum, k, min_energy=1e-10,
                                   t_eps=3e-4, disc_eps=1e-6, block=64,
                                   count_hits=False, need_local=False,
                                   split_mode=split_mode)
        return bu.pos, ac.absorbed, (rec.split if split_mode else rec.sid)

    bench("fused bounce (nonsplit scene)",
          lambda b, k: bounce(t_ns, False, b, k), bundle, key)
    bench("jnp bounce (split scene)",
          lambda b, k: bounce(t_sp, True, b, k), bundle, key)

    # overflow-machinery primitives at slab size
    mask = jax.random.bernoulli(key, 0.3, (n,))
    x = jnp.arange(n, dtype=jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, n)
    bench("cumsum(bool) (n,)", lambda m: jnp.cumsum(m.astype(jnp.int32)),
          mask)
    bench("gather x[idx] f32 (n,)", lambda a, i: a[i], x, idx)
    bench("scatter at[idx].set f32 (n,)",
          lambda a, i: a.at[i].set(1.0, mode="drop"), x, idx)
    bench("10x gather", lambda a, i: sum(a[(i + j) % n].sum()
                                         for j in range(10)), x, idx)


if __name__ == "__main__":
    main()
