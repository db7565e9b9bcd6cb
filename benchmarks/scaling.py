"""Field-size scaling study: throughput vs heliostat count.

``python -m benchmarks.scaling`` traces radial-stagger north fields of
growing size (the 218-heliostat real NSTTF site extended at matching
density, benchmarks/nsttf.py) with the relevancy-culled streaming
megakernel and prints one JSON line per size.

This is the scaling regime the reference cannot reach: its per-bounce
Kd traversal is a per-ray Python loop (tracer/accel_tree.py:241-308).
Here the per-block candidate lists keep the kernel's row loop near
constant while the field grows ~25x.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()


def run_size(n_heliostats: int, slab_tiles: int | None = None,
             reps: int = 4, mesh_devices: int = 1) -> dict:
    """One field size. ``mesh_devices > 1`` runs the MESH-SHARDED culled
    path (build_block_culling(mesh_devices=D) + trace_streaming_sharded):
    the block grid and the packed rows table split across D devices via
    per-device uniform SMEM segments (culling.mesh_segment_shards) — the
    path past the ~10k-row single-chip envelope. The harness is identical
    on real multi-chip hardware; today's driver has one chip, so --mesh
    runs there with D=1 (or on a virtual CPU mesh for validation —
    tests/test_mesh_scale.py exercises D=8 at 20,001 rows)."""
    from benchmarks.nsttf import build_scene, make_source_fn
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.kernels.pallas_intersect import TILE

    table, meta, info = build_scene(n_heliostats=n_heliostats)
    base_tiles = 2 * ((1 << 20) // TILE + 1)
    if slab_tiles is None:
        # cell area, not cell count, sets the candidate-list length: scale
        # the block grid with the field footprint so cells keep the tuned
        # density (2x the round-2 grid — the slab sweep in bench.py showed
        # finer cells cut L_mean 16.7 -> 12.1 for +5%). A mesh multiplies
        # the affordable grid: every device contributes one chip's blocks.
        pos = info["positions"][:, :2]
        r = float(np.hypot(*(pos - pos.mean(axis=0)).T).max()) + 10.0
        slab_tiles = int(np.clip(round(base_tiles * (r / 152.0) ** 2),
                                 base_tiles,
                                 8 * base_tiles)) * mesh_devices
        slab_tiles -= slab_tiles % mesh_devices
    slab = slab_tiles * TILE
    total = 32 * base_tiles * TILE   # same emission budget for every size
    source_fn = make_source_fn(info, slab)
    t0 = time.perf_counter()
    try:
        culling = build_block_culling(table, meta, source_fn.pallas_spec,
                                      slab, mesh_devices=mesh_devices)
    except ValueError as exc:
        # single-chip SMEM wall: candidate lists for this field no longer
        # fit next to the rows table (shard over a mesh to split them) —
        # fall back to the unculled streaming megakernel
        print(f"# n={n_heliostats}: culling infeasible on one chip "
              f"({exc}); timing the unculled megakernel")
        culling = None
    t_build = time.perf_counter() - t0

    if mesh_devices > 1:
        from tracer_tpu.parallel import default_mesh, trace_streaming_sharded
        mesh = default_mesh(mesh_devices)

        def step(key):
            return trace_streaming_sharded(
                table, source_fn, key, total * mesh_devices, mesh,
                max_rounds=600, max_path=8, culling=culling)
    else:
        @jax.jit
        def step(key):
            return trace_streaming(table, source_fn, key, total_rays=total,
                                   max_rounds=600, max_path=8,
                                   culling=culling)

    accum, emitted, se = jax.block_until_ready(step(jax.random.PRNGKey(0)))
    ab = np.asarray(accum.absorbed)
    se = float(se)
    closure = (se - ab.sum() - float(accum.escaped) - float(accum.culled)
               - float(accum.medium) - float(accum.residual)) / se
    assert abs(closure) < 5e-3, closure
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(step(jax.random.fold_in(jax.random.PRNGKey(0),
                                                      i)))
        best = min(best, time.perf_counter() - t0)
    return dict(metric="field_scaling", n_heliostats=n_heliostats,
                n_rows=int(table.num_rows), slab_tiles=slab_tiles,
                value=round(float(emitted) / best / 1e6, 1),
                unit=("Mrays/s/chip" if mesh_devices == 1
                      else f"Mrays/s/{mesh_devices}chips"),
                mesh_devices=mesh_devices,
                culled=culling is not None,
                L_mean=(round(culling.stats["L_mean"], 1)
                        if culling is not None else None),
                n_segments=(culling.stats.get("mesh_n_seg")
                            or culling.n_segments
                            if culling is not None else None),
                build_s=round(t_build, 1),
                receiver_frac=round(float(ab.max()) / se, 4),
                closure=float(closure))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=1,
                    help="devices to shard the culled block grid over "
                         "(trace_streaming_sharded); 1 = single chip")
    ap.add_argument("--sizes", type=int, nargs="*", default=None,
                    help="heliostat counts (default: the standard ladder)")
    args = ap.parse_args()
    if args.sizes:
        for n in args.sizes:
            print(json.dumps(run_size(n, mesh_devices=args.mesh)))
        return
    # 2000 heliostats: the footprint is so large that even the clipped
    # 5472-tile grid leaves cells ~2.6x the tuned size while doubling the
    # per-round slab cost of the 8 SMEM segments — the 2736-tile grid
    # measures faster (188 vs 154 Mrays/s cross-process).
    # 5000/10000 heliostats (5001/10001 rows): beyond the whole-table SMEM
    # wall — the segments ship per-segment row SHARDS
    # (culling.seg_row_ids, round-3 verdict item 4) so the culled path
    # keeps running where round 3 raised "scene too large". Past ~10k rows
    # use --mesh D (per-device row shards + split cell grid,
    # culling.mesh_segment_shards).
    for n, st in ((218, None), (500, None), (1000, None), (2000, 2736),
                  (5000, 2736), (10000, 2736)):
        print(json.dumps(run_size(n, slab_tiles=st,
                                  mesh_devices=args.mesh)))


if __name__ == "__main__":
    main()
