"""Real Sandia NSTTF heliostat field: trace the as-built 218-heliostat
layout and attribute blocking / shading / spillage per heliostat.

Mirrors the reference's `examples/Sandia_NSTTF_field example.py` workflow
(gen_rays + multi_ray_sim + the :229-301 genealogy analysis) on the
record-based engine: one host-stepped trace with records, then a fully
vectorized attribution (analysis/losses.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tracer_tpu import spatial as sp
from tracer_tpu.analysis.losses import field_losses, projected_areas
from tracer_tpu.engine import TracerEngine, TraceOptions
from tracer_tpu.models.heliostat_field import (HeliostatField,
                                               load_heliostat_positions,
                                               solar_vector)
from tracer_tpu.models.one_sided_mirror import one_sided_receiver
from tracer_tpu.scene import Assembly, compile_scene
from tracer_tpu.sources import buie_sunshape


def build_sandia_plant(azimuth=0.0, zenith=np.pi / 6, sigma=1.5e-3,
                       tower_height=60.0, csv_path=None, n_heliostats=None):
    """(table, meta, info) for the real NSTTF field + tower receiver."""
    positions = load_heliostat_positions(csv_path)
    if n_heliostats is not None:
        positions = positions[:n_heliostats]
    field = HeliostatField(positions, width=6.1, height=6.1,
                           absorptivity=0.1, sigma=sigma, bi_var=True)
    field.set_aim_height(tower_height)
    normals = field.track_sun(azimuth=azimuth, zenith=zenith)

    _, rec = one_sided_receiver(11.0, 11.0)
    center = positions.mean(axis=0)
    aim = np.array([center[0], center[1], -tower_height * 0.75])
    aim /= np.linalg.norm(aim)
    rec.set_transform(sp.translate(0, 0, tower_height)
                      @ sp._homog(sp.rotation_to_z(aim)))
    asm = Assembly(objects=[rec], subassemblies=[field])
    table, meta = compile_scene(asm, dtype=jnp.float32)
    info = dict(positions=positions, normals=normals,
                sun=solar_vector(azimuth, zenith),
                mirror_area=6.1 * 6.1, tower_height=tower_height)
    return table, meta, info


def main(num_rays=200_000, flux=1000.0):
    table, meta, info = build_sandia_plant()
    positions = info["positions"]
    center_xy = positions.mean(axis=0)
    extent = np.max(np.hypot(*(positions[:, :2] - center_xy[:2]).T)) + 10.0
    src_center = center_xy + info["sun"] * 300.0

    bundle = buie_sunshape(jax.random.PRNGKey(0), num_rays,
                           center=src_center, direction=-info["sun"],
                           radius=extent, CSR=0.02, flux=flux)
    eng = TracerEngine(table, meta)
    res = eng.ray_tracer(bundle, reps=6, key=jax.random.PRNGKey(1),
                         opts=TraceOptions(max_bounces=6))

    areas = projected_areas(info["normals"], info["sun"],
                            info["mirror_area"])
    losses = field_losses(res, flux=flux, proj_areas=areas)

    print(f"source {losses['source']/1e3:.1f} kW, "
          f"direct-on-receiver {losses['direct_receiver']/1e3:.2f} kW, "
          f"missed field {losses['escaped_source']/1e3:.1f} kW")
    print(f"audit: source residue {losses['audit_source']:.2e} W, "
          f"max per-heliostat residue "
          f"{np.abs(losses['audit_per_heliostat']).max():.2e} W")
    tot = {k: losses[k].sum() / 1e3 for k in
           ("incoming", "shading", "mirror", "blocked", "spilled",
            "delivered")}
    print("field totals [kW]: " + "  ".join(f"{k}={v:.1f}"
                                            for k, v in tot.items()))
    worst = np.argsort(losses["blocked"])[::-1][:5]
    print("most blocked heliostats:",
          [(int(h), round(float(losses['blocked'][h]) / 1e3, 2))
           for h in worst])
    bal = res.energy_balance()
    print(f"energy closure: {bal['closure']:.2e} of {bal['source']:.0f} W")
    return losses


if __name__ == "__main__":
    main()
