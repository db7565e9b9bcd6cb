"""Thermal-emission losses of a cavity receiver.

The full thermal pipeline on a 2N-parameter cavity (aperture + frustum
sections + back cone — the reference's TwoNparamcav,
models/Two_N_parameters_cavity.py): trace concentrated sunlight into the
cavity, compute radiative view factors by adaptive MC (batched device
path), then solve the radiosity system for the emissive losses of the
hot walls and iterate a (pluggable) wall-temperature model against the
net absorbed power.
"""
import jax
import numpy as np

from tracer_tpu import TracerEngine
from tracer_tpu.models.two_n_cavity import TwoNParamCav
from tracer_tpu.sources import disk_bundle


def main(num_rays=100_000, vf_rays=4000):
    # 0.3 m aperture, two frustum sections opening to 0.5 m, flat back
    cav = TwoNParamCav(apertureRadius=0.3, frustaRadii=[0.45, 0.5],
                       frustaDepths=[0.4, 0.4], coneDepth=0.0,
                       eps_wall=0.87, el_FRUs=[2, 2], el_CON=2)

    # concentrated solar input through the aperture (a converging cone
    # of rays entering from below, ~1 MW/m^2 at the aperture plane)
    key = jax.random.PRNGKey(3)
    sun = disk_bundle(key, num_rays, center=[0.0, 0.0, -0.2],
                      direction=[0.0, 0.0, 1.0], radius=0.28,
                      ang_range=0.25, flux=1.0e6)
    eng = TracerEngine(cav)
    res = eng.ray_tracer(sun, reps=30, key=jax.random.PRNGKey(4),
                         min_energy=1e-3)
    bal = res.energy_balance()
    src = bal["source"]
    solar_in = cav.bin_hits(res)
    print(f"solar input {src / 1e3:.1f} kW: walls absorb "
          f"{100 * solar_in[1:].sum() / src:.1f}%, back out the "
          f"aperture {100 * solar_in[0] / src:.1f}%, missed "
          f"{100 * bal['escaped'] / src:.1f}%")

    # adaptive MC view factors (Welford 3-sigma + reciprocity + sum=1
    # gates; one device call per iteration) + radiosity solve
    print("computing view factors...")
    VF, areas = cav.VF_sim(num_rays=vf_rays, precision=0.02,
                           key=jax.random.PRNGKey(5))
    recip = np.abs(areas[:, None] * VF - (areas[:, None] * VF).T).max()
    print(f"  {VF.shape[0]} elements; max reciprocity defect "
          f"{recip:.2e} m^2; row sums {VF.sum(axis=1).min():.4f}.."
          f"{VF.sum(axis=1).max():.4f}")

    out = cav.energy_balance(res, T_init=900.0)
    print(f"emissive losses at 900 K walls: "
          f"{out['emissive_losses'] / 1e3:.2f} kW "
          f"({100 * out['emissive_losses'] / src:.1f}% of solar input)")
    q = out["Q"]
    for i, Qi in enumerate(q):
        kind = "aperture" if i == 0 else f"element {i}"
        print(f"  {kind:10s} net radiative gain {Qi / 1e3:+7.2f} kW")
    # the aperture's net gain is (minus) the cavity's loss to ambient,
    # up to the MC precision of the view factors (the radiosity solve is
    # exact given VF; VF reciprocity/summation close to ~the precision
    # argument)
    np.testing.assert_allclose(-q[0], q[1:].sum(), rtol=0.05)
    return out


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()
