"""Probe: differentiable-gradient throughput vs ray-batch size and remat.

Config 9 measures one jitted value_and_grad of the spot-RMS loss at
262k rays (~4 Mrays/s on capture day). The forward+backward program is
pure jnp (the Pallas kernels have no VJP), so its throughput should be
dominated by fixed per-call overhead at small batches — this probe
sweeps the batch size and the checkpoint (remat) flag to find where the
gradient step saturates on one chip.

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


def probe(n_rays: int, bounces: int = 3, checkpoint: bool = False,
          reps: int = 5) -> dict:
    from tracer_tpu import diff, geometry as G, materials as M
    from tracer_tpu import spatial as sp
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene)
    from tracer_tpu.sources import disk_bundle

    f0 = 2.0
    dish = Surface(G.parabolic_dish(2.0, f0), M.reflective(0.05),
                   name="dish")
    recv = Surface(G.rect_plate(0.5, 0.5), M.lambertian(0.95),
                   location=[0.0, 0.0, f0],
                   rotation=sp.rotx(np.pi)[:3, :3], name="receiver")
    table, meta = compile_scene(Assembly([AssembledObject([dish, recv])]),
                                dtype=jnp.float32)
    d_rows = np.nonzero(meta.row_logical == meta.index_of("dish"))[0]
    r_rows = np.nonzero(meta.row_logical == meta.index_of("receiver"))[0]
    beam = disk_bundle(jax.random.PRNGKey(9), n_rays,
                       center=[0.0, 0.0, 5.0], direction=[0.0, 0.0, -1.0],
                       radius=0.95, radius_in=0.45, ang_range=1e-4,
                       flux=1000.0)
    key = jax.random.PRNGKey(10)

    def loss(f):
        q = 1.0 / (4.0 * f)
        quad = jnp.zeros((10,), jnp.float32).at[0].set(q).at[1].set(q) \
            .at[8].set(-0.5)
        t = diff.with_rows(table, d_rows, quadric=quad[None])
        _, mom = diff.trace_diff(t, beam, key, bounces=bounces,
                                 checkpoint=checkpoint)
        return diff.spot_rms(mom, r_rows)

    step = jax.jit(jax.value_and_grad(loss))
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
        for n in (262_144, 1_048_576, 4_194_304, 16_777_216):
            try:
                print(json.dumps(probe(n, checkpoint=ck)))
            except Exception as e:  # OOM etc. — report and continue
                print(json.dumps(dict(n_rays=n, checkpoint=ck,
                                      error=str(e)[:200])))
