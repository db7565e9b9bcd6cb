"""End-to-end example: the reference's examples/test_case.py scenario.

5 m parabolic dish with a square kaleidoscope homogenizer, rotated a quarter
circle, traced under a pillbox sun; prints the energy balance and the
receiver flux histogram summary.
"""
import math

import jax
import numpy as np

from tracer_tpu import TracerEngine, spatial
from tracer_tpu.models.tau_minidish import MiniDish
from tracer_tpu.sources import solar_disk_bundle


def main(num_rays=100_000, focus=6.25, h_depth=0.7, side=0.4):
    assembly = MiniDish(5.0, focus, 0.9, focus + h_depth, side, h_depth, 0.9)
    assembly.set_transform(spatial.rotx(-np.pi / 4))

    x = -1.0 / math.sqrt(2.0)
    sun = solar_disk_bundle(jax.random.PRNGKey(42), num_rays,
                            center=[0.0, 7.0, 7.0], direction=[0.0, x, x],
                            radius=3.0, ang_range=0.005, flux=1000.0)

    engine = TracerEngine(assembly)
    res = engine.ray_tracer(sun, reps=100, min_energy=1e-6)

    bal = res.energy_balance()
    print("energy balance:", {k: round(v, 3) for k, v in bal.items()})
    print("bounces until depletion:", len(res.records))

    H, xb, yb = assembly.histogram_hits(res, bins=20)
    area = (side / 20) ** 2
    conc = H / area / 1000.0  # suns
    print(f"receiver: total {H.sum():.1f} W, peak {conc.max():.1f} suns, "
          f"mean {conc.mean():.1f} suns")
    absorbed = res.absorbed_by_logical()
    for i, name in enumerate(res.meta.names):
        print(f"  {name:12s} absorbed {absorbed[i]:10.2f} W")
    return res


if __name__ == "__main__":
    main()
