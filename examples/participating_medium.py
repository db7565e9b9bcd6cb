"""Radiative transfer in a participating medium.

A closed box of diffuse absorbing walls is filled with a homogeneous
Henyey-Greenstein scattering + Beer-Lambert absorbing medium (fog/
particle suspension — the reference's Scattering and Absorbant managers,
optics_callables.py:861-1036). A downward beam enters at the top; the
medium scatters it forward (g = 0.6) and absorbs along every path
segment, so energy splits between the medium and the walls.

The per-ray medium fields (att_coeff / scat_coeff / scat_g) drive the
engine volumetrics on every path; with a source spec declaring the
coefficients, the streaming megakernel lowers the free-path sampling and
phase draws in-kernel (BENCHMARKS.md config 8).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tracer_tpu import TracerEngine, geometry as G, materials as M
from tracer_tpu import spatial as sp
from tracer_tpu.scene import Assembly, AssembledObject, Surface, compile_scene
from tracer_tpu.sources import disk_bundle


def build_box(absorptivity=0.7):
    lam = lambda: M.lambertian(absorptivity=absorptivity)
    floor = Surface(G.rect_plate(6.0, 6.0), lam(), name="floor")
    ceil = Surface(G.rect_plate(6.0, 6.0), lam(), location=[0, 0, 4.0],
                   name="ceil")
    walls = []
    # roty walls: local x -> global z (4 tall); rotx walls: local x stays
    # global x (6 wide), local y -> global z (4 tall)
    for i, (x, y, w, h, rot) in enumerate([
            (3.0, 0.0, 4.0, 6.0, sp.roty(np.pi / 2)),
            (-3.0, 0.0, 4.0, 6.0, sp.roty(-np.pi / 2)),
            (0.0, 3.0, 6.0, 4.0, sp.rotx(-np.pi / 2)),
            (0.0, -3.0, 6.0, 4.0, sp.rotx(np.pi / 2))]):
        walls.append(Surface(G.rect_plate(w, h), lam(),
                             location=[x, y, 2.0], rotation=rot[:3, :3],
                             name=f"wall{i}"))
    return Assembly([AssembledObject([floor, ceil] + walls)])


def main(num_rays=100_000, att=0.15, scat=0.4, g=0.6):
    table, meta = compile_scene(build_box(),
                                extra_features=("volumetric",))
    eng = TracerEngine(table, meta)

    key = jax.random.PRNGKey(11)
    beam = disk_bundle(key, num_rays, center=[0.0, 0.0, 3.7],
                       direction=[0.0, 0.0, -1.0], radius=1.5,
                       ang_range=0.2, flux=1000.0)
    dt = beam.pos.dtype
    beam = beam.replace(att_coeff=jnp.full((num_rays,), att, dt),
                        scat_coeff=jnp.full((num_rays,), scat, dt),
                        scat_g=jnp.full((num_rays,), g, dt))

    res = eng.ray_tracer(beam, reps=60, key=jax.random.PRNGKey(1),
                         min_energy=1e-5)
    bal = res.energy_balance()
    print("energy balance:", {k: round(float(v), 1)
                              for k, v in bal.items()})
    src = bal["source"]
    print(f"medium absorbed   {100 * bal['medium'] / src:5.1f}%")
    ab = res.absorbed_by_logical()
    for name, a in zip(meta.names, ab):
        print(f"  {name:8s} absorbed {100 * float(a) / src:5.1f}%")
    # a closed enclosure: nothing escapes, closure is exact
    assert bal["escaped"] / src < 1e-6
    assert abs(bal["closure"]) < 1e-4
    return res


def main_bounded(num_rays=100_000, att=0.15, scat=0.4, g=0.6):
    """Same box, but the medium is CONFINED to a layer between two
    index-matched boundary sheets (materials.scattering_interface — the
    reference's Scattering/Absorbant used as volume boundaries): rays
    pick up the medium on crossing in and drop it on crossing out. On
    the fused streaming path this runs the megakernel's media mode
    (per-lane medium ids toggled at the crossings)."""
    bound = lambda: M.scattering_interface(scat, g=g, att_inside=att)
    m1 = Surface(G.rect_plate(6.0, 6.0), bound(), location=[0, 0, 3.0],
                 name="medium_top")
    m2 = Surface(G.rect_plate(6.0, 6.0), bound(), location=[0, 0, 1.0],
                 name="medium_bot")
    asm = build_box()
    asm.add_object(AssembledObject([m1, m2]))
    table, meta = compile_scene(asm)
    assert "volumetric" in table.features   # set by the boundary rows
    eng = TracerEngine(table, meta)

    beam = disk_bundle(jax.random.PRNGKey(12), num_rays,
                       center=[0.0, 0.0, 3.7], direction=[0.0, 0.0, -1.0],
                       radius=1.5, ang_range=0.2, flux=1000.0)
    res = eng.ray_tracer(beam, reps=60, key=jax.random.PRNGKey(2),
                         min_energy=1e-5)
    bal = res.energy_balance()
    src = bal["source"]
    print("bounded-layer medium absorbed "
          f"{100 * bal['medium'] / src:5.1f}% "
          f"(vs the filled box above — the layer is half the depth)")
    assert bal["escaped"] / src < 1e-6
    assert abs(bal["closure"]) < 1e-4
    return res


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()
    main_bounded()
