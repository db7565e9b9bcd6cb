"""Render a parabolic dish + receiver with the receiver's flux map
colormapped onto the geometry (the reference's Coin3D fluxmap texturing,
tracer/surface.py:146-252 + CoIn_rendering/rendering.py:85-124).

Saves dish_textured.png: the dish mesh, traced ray polylines, and the
receiver colored by W/m^2 with a colorbar.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tracer_tpu import geometry as G, materials as M, spatial as sp
from tracer_tpu.engine import TracerEngine, TraceOptions
from tracer_tpu.scene import Assembly, AssembledObject, Surface, compile_scene
from tracer_tpu.sources import disk_bundle
from tracer_tpu.viz.render import Renderer


def main(num_rays=200_000, out="dish_textured.png"):
    dish = Surface(G.parabolic_dish(2.0, 1.5),
                   M.reflective(0.1, sigma=2e-3, bi_var=True,
                                one_sided=True),
                   name="dish", fixed_color="silver")
    rec = Surface(G.round_plate(0.10),
                  M.receiver(M.lambertian(0.9, one_sided=True)),
                  name="rec", location=[0.0, 0.0, 1.5],
                  rotation=sp.rotx(np.pi)[:3, :3], fixed_color="k")
    asm = Assembly([AssembledObject([dish, rec])])
    table, meta = compile_scene(asm)

    bundle = disk_bundle(jax.random.PRNGKey(0), num_rays,
                         center=[0.0, 0.0, 3.0], direction=[0.0, 0.0, -1.0],
                         radius=1.05, ang_range=4.65e-3, flux=1000.0)
    eng = TracerEngine(table, meta)
    res = eng.ray_tracer(bundle, reps=20, key=jax.random.PRNGKey(1),
                         opts=TraceOptions(max_bounces=20, record="tags"))
    bal = res.energy_balance()
    print("energy balance:", {k: round(v, 1) for k, v in bal.items()})

    r = Renderer(eng)
    r.show_geom(fluxmap_from=res, flux_resolution=24)
    # a handful of ray polylines for context (needs full records)
    small = jax.tree_util.tree_map(lambda a: a[:256], bundle)
    res_full = eng.ray_tracer(small, reps=6, key=jax.random.PRNGKey(1),
                              opts=TraceOptions(max_bounces=6, record=True))
    r.show_rays(res_full, max_rays=40)
    r.save(out)
    print(f"saved {out}")
    return out


if __name__ == "__main__":
    main()
