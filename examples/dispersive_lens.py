"""Chromatic aberration through a dispersive spherical lens.

A BK7 singlet focuses a collimated white beam (400-700 nm); because
n(wl) falls with wavelength, blue focuses shorter than red. A receiver
at the mean-index focal plane records every hit with its wavelength, and
the per-color RMS spot radii show the chromatic blur: the middle of the
band focuses tightest at that plane, the band edges land defocused.

Dispersive interfaces (materials.refractive_material, the TPU rebuild of
the reference's material-based Refractive manager,
optics_callables.py:726) run on every engine path; with a bakeable
banded source they ride the streaming megakernel (in-kernel n(wl)
interpolation, docs/performance.md).
"""
import jax
import numpy as np

from tracer_tpu import TracerEngine, geometry as G, materials as M
from tracer_tpu.engine import TraceOptions
from tracer_tpu.models.spherical_lens import SphericalLens
from tracer_tpu.scene import Assembly, AssembledObject, Surface
from tracer_tpu.sources import disk_bundle


def sellmeier_bk7(wl):
    """BK7 refractive index (Sellmeier, wl in meters)."""
    w2 = (np.asarray(wl) * 1e6) ** 2
    n2 = (1.0
          + 1.03961212 * w2 / (w2 - 0.00600069867)
          + 0.231792344 * w2 / (w2 - 0.0200179144)
          + 1.01046945 * w2 / (w2 - 103.560653))
    return np.sqrt(n2)


def main(num_rays=200_000):
    band = (400e-9, 700e-9)
    wls = np.linspace(band[0], band[1], 64)
    lens = SphericalLens(diameter=0.5, depth=0.02, R1=0.3, R2=-0.3,
                         refr_idx=(wls, sellmeier_bk7(wls)))
    f_blue = lens.focal_length(wavelength=band[0])
    f_red = lens.focal_length(wavelength=band[1])
    f_mid = lens.focal_length()
    print(f"paraxial focus: {f_blue * 100:.2f} cm (400 nm), "
          f"{f_mid * 100:.2f} cm (mean), {f_red * 100:.2f} cm (700 nm)")

    screen = AssembledObject([Surface(
        G.round_plate(0.1), M.absorber(one_sided=False),
        location=[0.0, 0.0, -f_mid], name="screen")])
    asm = Assembly([lens, screen])

    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    # a slim beam (f/7) keeps spherical aberration below the chromatic
    # focal shift so the per-color spot sizes show the dispersion
    beam = disk_bundle(k1, num_rays, center=[0.0, 0.0, 0.5],
                       direction=[0.0, 0.0, -1.0], radius=0.02,
                       ang_range=1e-5, flux=1000.0)
    wl = jax.random.uniform(k2, (num_rays,), minval=band[0],
                            maxval=band[1], dtype=beam.pos.dtype)
    beam = beam.replace(wavelength=wl)

    eng = TracerEngine(asm)
    res = eng.ray_tracer(beam, reps=10, key=jax.random.PRNGKey(1),
                         opts=TraceOptions(max_bounces=10))

    bal = res.energy_balance()
    print("energy balance:", {k: round(float(v), 2)
                              for k, v in bal.items()})
    hits = res.hits_of("screen")
    # direct rays refract twice then hit the screen at bounce 2; later
    # bounces are Fresnel-reflection ghosts that focus elsewhere
    direct = hits["bounce"] == 2
    r = np.hypot(hits["local"][direct, 0], hits["local"][direct, 1])
    hwl = hits["wavelength"][direct]
    e = hits["absorbed"][direct]
    print("per-color RMS spot radius at the mean-focus plane:")
    rms = {}
    for name, lo, hi in (("400-450 nm", 400e-9, 450e-9),
                         ("525-575 nm", 525e-9, 575e-9),
                         ("650-700 nm", 650e-9, 700e-9)):
        m = (hwl >= lo) & (hwl < hi)
        rms[name] = np.sqrt(np.average(r[m] ** 2, weights=e[m]))
        print(f"  {name}: {1e3 * rms[name]:6.3f} mm "
              f"({100 * e[m].sum() / e.sum():.1f}% of the direct power)")
    # the band middle focuses tightest at the mean-index plane
    assert rms["525-575 nm"] < rms["400-450 nm"]
    assert rms["525-575 nm"] < rms["650-700 nm"]
    return res


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()
