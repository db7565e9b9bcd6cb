"""Multi-chip NSTTF trace: the TPU-native replacement for the reference's
process-pool engine (`tracer/tracer_engine_mp.py`) — a `jax.sharding.Mesh`
over the ray axis with psum-merged accounting.

On a multi-chip host this scales over ICI with zero cross-device traffic
until the final reduction (the relevancy-culled source-cell grid is
itself sharded). Without TPU hardware, run it on a virtual CPU mesh:

    python examples/multichip_trace.py --cpu-devices 8

Compare the per-surface results across device counts: they agree up to
MC statistics (per-shard folded PRNG keys), unlike the reference's
irreproducible per-process global numpy RNG.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_devices=None, cpu_devices=0, n_rays=2_000_000):
    if cpu_devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={cpu_devices}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    from benchmarks.nsttf import build_scene, make_source_fn
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.kernels.pallas_intersect import TILE
    from tracer_tpu.parallel import default_mesh, trace_streaming_sharded

    mesh = default_mesh(n_devices)
    n_dev = mesh.devices.size
    print(f"mesh: {n_dev} x {mesh.devices.flat[0].platform} device(s)")

    table, meta, info = build_scene()
    # global block count: must split evenly over the mesh (336 = 2^4*3*7
    # covers the usual 1/2/4/8-device meshes; 342 matches bench.py's grid)
    nb_global = 342 if 342 % n_dev == 0 else 336
    nb_per_dev = nb_global // n_dev
    source_fn = make_source_fn(info, nb_per_dev * TILE)  # per-DEVICE slab

    culling = None
    if mesh.devices.flat[0].platform == "tpu":
        # the Pallas culled kernel needs real TPU; CPU meshes use the
        # general streaming path (same physics)
        source_fn = make_source_fn(info, nb_global * TILE)
        culling = build_block_culling(table, meta, source_fn.pallas_spec,
                                      nb_global * TILE)

    accum, emitted, src_e = jax.block_until_ready(trace_streaming_sharded(
        table, source_fn, jax.random.PRNGKey(0), n_rays, mesh,
        max_rounds=200, max_path=8, culling=culling))

    se = float(src_e)
    ab = np.asarray(accum.absorbed)
    closure = (se - ab.sum() - float(accum.escaped) - float(accum.culled)
               - float(accum.medium) - float(accum.residual)) / se
    rec = ab.max() / se
    print(f"emitted {int(emitted)/1e6:.2f}M rays on {n_dev} device(s)")
    print(f"receiver fraction {rec:.4f}   energy closure {closure:.2e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="use the first N devices of the default backend")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force a virtual CPU mesh of this size")
    ap.add_argument("--rays", type=int, default=2_000_000)
    a = ap.parse_args()
    main(n_devices=a.devices, cpu_devices=a.cpu_devices, n_rays=a.rays)
