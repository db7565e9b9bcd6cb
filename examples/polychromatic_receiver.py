"""Polychromatic tracing: per-ray spectra filtered by a spectral mirror.

The reference lets bundles carry full spectra that spectral managers
multiply (tracer/optics_callables.py:137-138) and records them via
PolychromaticAccountant (:1825). Here every ray carries a solar-ish
spectrum over ONE shared wavelength grid; a silver-coated mirror (bundled
n,k database) filters it, and the receiver's per-hit spectra come back
through the accountant query (`hits_of(...)["spectra"]`).

Run: ``python examples/polychromatic_receiver.py``
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from tracer_tpu import geometry as G, materials as M, spatial as sp  # noqa: E402
from tracer_tpu.bundle import RayBundle  # noqa: E402
from tracer_tpu.engine import TracerEngine  # noqa: E402
from tracer_tpu.optical_constants import from_sopra  # noqa: E402
from tracer_tpu.scene import Assembly, AssembledObject, Surface  # noqa: E402


def main(n_rays: int = 4096):
    # shared wavelength grid + a crude 5800 K solar spectrum shape
    grid = np.linspace(350e-9, 1800e-9, 64)
    from tracer_tpu.electromagnetics import planck
    shape = planck(grid, 5800.0)
    spectra = np.tile(1000.0 * shape / np.trapezoid(shape, grid),
                      (n_rays, 1))                       # 1 kW per ray

    # silver mirror: absorptance 1 - R(n, k) from the bundled database
    m = from_sopra("AG").m(grid)
    alpha = 1.0 - (((m.real - 1) ** 2 + m.imag**2)
                   / ((m.real + 1) ** 2 + m.imag**2))
    mirror = Surface(G.rect_plate(2.0, 2.0),
                     M.reflective_spectral(alpha, grid),
                     rotation=sp.rotx(-np.pi / 4)[:3, :3], name="mirror")
    rec = Surface(G.rect_plate(4.0, 4.0),
                  M.with_accounting(M.absorber(one_sided=False),
                                    "location", "absorption",
                                    "polychromatic"),
                  location=[0.0, 3.0, 0.0],
                  rotation=sp.rotx(np.pi / 2)[:3, :3], name="rec")
    eng = TracerEngine(Assembly([AssembledObject([mirror, rec])]))

    bund = RayBundle.create(
        pos=np.tile([0.0, 0.0, 1.5], (n_rays, 1)),
        dir=np.tile([0.0, 0.0, -1.0], (n_rays, 1))).with_spectra(
            grid, spectra)
    res = eng.ray_tracer(bund, reps=4, key=jax.random.PRNGKey(0))

    hits = res.hits_of("rec")
    e_in = float(np.asarray(bund.energy).sum())
    got = hits["e_in"].sum()
    print(f"source power            {e_in / 1e3:10.2f} kW")
    print(f"receiver power          {got / 1e3:10.2f} kW "
          f"({100 * got / e_in:.1f}% — silver filters the UV/blue)")
    # band split of the received spectrum (the accountant's spectra are
    # post-absorption = 0 on the black receiver; use the mirror's)
    m_hits = res.hits_of("mirror")
    s = m_hits["spectra"].mean(axis=0)
    blue = np.trapezoid(np.where(grid < 600e-9, s, 0.0), grid)
    red = np.trapezoid(np.where(grid >= 600e-9, s, 0.0), grid)
    print(f"mean reflected ray      {blue / 1e3:10.2f} kW below 600 nm, "
          f"{red / 1e3:.2f} kW above (of 1 kW emitted)")
    bal = (np.asarray(res.accum.absorbed).sum() + float(res.accum.escaped)
           + float(res.accum.culled) + float(res.accum.residual))
    print(f"closure                 {abs(bal - e_in) / e_in:10.2e}")
    return got / e_in


if __name__ == "__main__":
    main()
