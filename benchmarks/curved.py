"""Curved-facet NSTTF benchmark: the 218-pad Sandia field with
slant-focused PARABOLIC mirrors (real heliostats are focused; flat facets
are the idealization bench.py times). Two quadric classes in one scene —
parab mirrors + flat receiver — so this exercises the multi-group culled
megakernel's specialized parab solve (scene.compile_scene group classes).

``python -m benchmarks.curved`` prints one JSON line.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()


def run(reps: int = 6, total_mult: int = 128) -> dict:
    import jax.numpy as jnp
    from benchmarks.nsttf import make_source_fn, nsttf_positions, solar_vector
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.kernels.pallas_intersect import TILE
    from tracer_tpu.models.heliostat_field import HeliostatField
    from tracer_tpu.models.one_sided_mirror import one_sided_receiver
    from tracer_tpu.scene import Assembly, compile_scene
    import tracer_tpu.spatial as sp

    pos = nsttf_positions(218)
    slant = np.hypot(np.hypot(pos[:, 0], pos[:, 1]), 60.0)
    field = HeliostatField(pos, width=6.1, height=6.1, absorptivity=0.1,
                           sigma=1.5e-3, bi_var=True, focal_lengths=slant)
    field.set_aim_height(60.0)
    field.track_sun(azimuth=0.0, zenith=np.pi / 6)
    _, rec = one_sided_receiver(11.0, 11.0)
    center = pos.mean(axis=0)
    aim = np.array([center[0], center[1], -45.0])
    aim /= np.linalg.norm(aim)
    rec.set_transform(sp.translate(0, 0, 60.0)
                      @ sp._homog(sp.rotation_to_z(aim)))
    table, meta = compile_scene(Assembly(objects=[rec],
                                         subassemblies=[field]),
                                dtype=jnp.float32)
    tags = [g[3] for g in table.groups]
    assert "parab" in tags, tags   # the specialized solve is exercised

    # 3x the 1M-lane slab: curved corridors are longer than flat ones, so
    # finer source cells pay off further (same-process sweep: x1 273.8,
    # x2 301.0, x3 308.3 Mrays/s; L_mean 18.0 -> 13.2 -> 11.4)
    base = (1 << 20) // TILE * TILE + TILE
    slab = 3 * base
    # like bench.py's headline call: the drain tail is roughly fixed in
    # rounds, so sustained throughput needs a large rays/call (production
    # CSP studies trace 1e8-1e9 rays)
    total = total_mult * base
    source_fn = make_source_fn(dict(positions=pos,
                                    sun=solar_vector(0.0, np.pi / 6)),
                               slab)
    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)

    @jax.jit
    def step(key):
        return trace_streaming(table, source_fn, key, total_rays=total,
                               max_rounds=400, max_path=8, culling=culling)

    key = jax.random.PRNGKey(0)
    accum, emitted, se = jax.block_until_ready(step(key))
    ab = np.asarray(accum.absorbed)
    se = float(se)
    closure = (se - ab.sum() - float(accum.escaped) - float(accum.culled)
               - float(accum.medium) - float(accum.residual)) / se
    rec_frac = float(ab.max()) / se
    assert abs(closure) < 5e-3, closure
    # focused facets spill less than flat ones: higher receiver fraction
    assert 0.04 < rec_frac < 0.09, rec_frac

    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(step(jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    return dict(metric="nsttf_curved_trace_throughput",
                value=round(float(emitted) / best / 1e6, 1),
                unit="Mrays/s/chip", receiver_frac=round(rec_frac, 4),
                L_mean=round(culling.stats["L_mean"], 1),
                closure=float(closure))


if __name__ == "__main__":
    import sys
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(json.dumps(run(total_mult=mult)))
