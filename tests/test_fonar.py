"""Binned axisymmetric (FONaR-style) RTVF test: an open cylinder cavity
described purely by a binning scheme must reproduce the same analytic view
factors as the 2N-parameter driver (Holman cylinder-cavity case)."""
import jax
import numpy as np

from tracer_tpu.analysis.view_factors import (BinnedAxisymmetricRTVF,
                                              build_two_n_cavity)

R = 0.01
L = 0.01  # three sections of length R plus end discs

HOLMAN_VF = np.array([
    [0.0,    0.63,   0.195,  0.075,  0.1],
    [0.315,  0.37,   0.2175, 0.06,   0.0375],
    [0.0975, 0.2175, 0.37,   0.2175, 0.0975],
    [0.0375, 0.06,   0.2175, 0.37,   0.315],
    [0.1,    0.075,  0.195,  0.63,   0.0],
])


def test_binned_rtvf_cylinder_cavity():
    # scene: the same cavity geometry (aperture + 3 cylinder sections +
    # back plate), walls absorptivity 1
    asm = build_two_n_cavity(R, [R, R, R], [L, L, L], 0.0)
    full = 2.0 * np.pi
    scheme = np.array([
        [[0, full], [0.0, 0.0], [0.0, R]],        # aperture disc
        [[0, full], [0.0, L], [R, R]],            # cylinder section 1
        [[0, full], [L, 2 * L], [R, R]],          # section 2
        [[0, full], [2 * L, 3 * L], [R, R]],      # section 3
        [[0, full], [3 * L, 3 * L], [0.0, R]],    # back plate
    ])
    areas = np.array([np.pi * R**2, 2 * np.pi * R * L, 2 * np.pi * R * L,
                      2 * np.pi * R * L, np.pi * R**2])
    # emission orientations: aperture fires +z (inward), walls fire toward
    # the axis, the back plate fires -z (into the cavity)
    rays_in = np.array([True, True, True, True, False])
    rt = BinnedAxisymmetricRTVF(asm, scheme, areas, num_rays=20000,
                                precision=0.02, rays_in=rays_in,
                                key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(rt.VF_esperance, HOLMAN_VF, atol=0.035)
    np.testing.assert_allclose(rt.VF_esperance.sum(axis=1), 1.0, atol=0.02)
