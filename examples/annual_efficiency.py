"""Annual optical-efficiency matrix of the real Sandia NSTTF field.

Sweeps a daylight-weighted sun-path grid (Albuquerque, 34.96 N) over the
bundled 218-heliostat field and prints the efficiency matrix plus the
annual aggregate — the field-performance workflow the reference would
need one full script run per sun position for
(`Sandia_NSTTF_field example.py` fixes azimuth/zenith at module top).

Each sun position is one streaming trace; on TPU the positions ride the
megakernel and the persistent compilation cache dedups the per-position
executables across runs. Run with a smaller grid/ray budget on CPU:

    python examples/annual_efficiency.py [n_days] [n_hours] [rays_log2]
"""
import sys

import jax
import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()

from tracer_tpu import spatial as sp                        # noqa: E402
from tracer_tpu.analysis.annual import (annual_sun_grid,    # noqa: E402
                                        efficiency_sweep)
from tracer_tpu.models.heliostat_field import (             # noqa: E402
    HeliostatField, load_heliostat_positions)
from tracer_tpu.models.one_sided_mirror import one_sided_receiver  # noqa: E402
from tracer_tpu.scene import Assembly                       # noqa: E402


def main(n_days=None, n_hours=None, rays_log2=None):
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    n_days = int(n_days or (4 if on_tpu else 2))
    n_hours = int(n_hours or (5 if on_tpu else 3))
    rays = 1 << int(rays_log2 or (24 if on_tpu else 17))

    positions = load_heliostat_positions()
    field = HeliostatField(positions, width=6.1, height=6.1,
                           absorptivity=0.1, sigma=1.5e-3, bi_var=True)
    tower = 60.0
    field.set_aim_height(tower)
    _, rec = one_sided_receiver(11.0, 11.0)
    center = positions.mean(axis=0)
    aim_dir = np.array([center[0], center[1], -tower * 0.75])
    aim_dir /= np.linalg.norm(aim_dir)
    rec.set_transform(sp.translate(0, 0, tower)
                      @ sp._homog(sp.rotation_to_z(aim_dir)))
    asm = Assembly(objects=[rec], subassemblies=[field])

    lat = np.deg2rad(34.96)   # Albuquerque, NM (the NSTTF site)
    grid = annual_sun_grid(lat, n_days=n_days, n_hours=n_hours)
    print(f"{len(grid)} sun positions, {rays / 1e6:.1f}M rays each, "
          f"{grid[:, 2].sum():.0f} daylight h represented "
          f"(+{grid.excluded:.0f} h below the elevation floor)")

    # the default (unculled megakernel) path shares ONE compiled
    # executable across every sun position — the source pose is a traced
    # kernel operand; use_culling=True trades that for the culled
    # kernel's higher per-trace throughput at one compile + one culling
    # build per position (worth it for few positions x many rays)
    res = efficiency_sweep(asm, field, grid,
                           total_mirror_area=len(positions) * 6.1 * 6.1,
                           rays_per_position=rays, aim_height=tower)

    print(f"{'azimuth':>8} {'zenith':>7} {'hours':>7} {'cos_eff':>8} "
          f"{'eta_opt':>8} {'P_rec MW':>9}")
    for i in range(len(grid)):
        print(f"{np.rad2deg(res['azimuth'][i]):8.1f} "
              f"{np.rad2deg(res['zenith'][i]):7.1f} "
              f"{res['weight'][i]:7.1f} {res['cosine_eff'][i]:8.3f} "
              f"{res['efficiency'][i]:8.3f} "
              f"{res['receiver_kw'][i] / 1e3:9.3f}")
    print(f"annual optical efficiency (daylight-weighted, incl. "
          f"{res['excluded_hours']:.0f} excluded h): "
          f"{res['annual_efficiency']:.4f}")
    print(f"annual receiver energy at DNI=1000 W/m^2: "
          f"{res['annual_receiver_mwh']:.0f} MWh")
    assert np.abs(res["closure"]).max() < 5e-3
    return res


if __name__ == "__main__":
    main(*sys.argv[1:])
