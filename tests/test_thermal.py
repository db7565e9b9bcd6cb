"""Thermal subsystem tests: MC view factors vs the textbook cylinder-cavity
case and the radiosity solver's energy balance (cf. ref
emissive_losses/emissive_losses_test.py 'Holman 8th ed. example 8.17')."""
import numpy as np
import pytest

from tracer_tpu.analysis.radiosity import radiosity_rtvf
from tracer_tpu.analysis.view_factors import (TwoNParametersCavityRTVF,
                                              build_two_n_cavity)

# Analytic view factors of a cylindrical cavity: aperture disc, three
# cylinder sections (L = R), back plate (Holman; also quoted in the
# reference's emissive_losses_test.py:41-46).
HOLMAN_VF = np.array([
    [0.0,    0.63,   0.195,  0.075,  0.1],
    [0.315,  0.37,   0.2175, 0.06,   0.0375],
    [0.0975, 0.2175, 0.37,   0.2175, 0.0975],
    [0.0375, 0.06,   0.2175, 0.37,   0.315],
    [0.1,    0.075,  0.195,  0.63,   0.0],
])


@pytest.fixture(scope="module")
def cavity_vf():
    return TwoNParametersCavityRTVF(
        apertureRadius=0.01, frustaRadii=[0.01, 0.01, 0.01],
        frustaDepths=[0.01, 0.01, 0.01], coneDepth=0.0,
        el_FRUs=[1, 1, 1], el_CON=1, num_rays=20000, precision=0.02)


def test_cavity_view_factors_match_analytic(cavity_vf):
    vf = cavity_vf.VF_esperance
    np.testing.assert_allclose(vf, HOLMAN_VF, atol=0.03)


def test_cavity_vf_rules(cavity_vf):
    vf = cavity_vf.VF_esperance
    areas = cavity_vf.areas
    # summation rule
    np.testing.assert_allclose(vf.sum(axis=1), 1.0, atol=0.02)
    # reciprocity rule A_i F_ij = A_j F_ji
    AF = vf * areas[:, None]
    np.testing.assert_allclose(AF, AF.T, atol=0.02 * AF.max())
    # analytic areas
    np.testing.assert_allclose(areas[0], np.pi * 0.01**2, rtol=1e-12)
    np.testing.assert_allclose(areas[1], 2 * np.pi * 0.01 * 0.01, rtol=1e-12)


def test_radiosity_holman_cavity():
    """Radiosity on the analytic VF matrix: hot cavity walls at 1000C, open
    aperture at ambient; energy must balance and the walls lose heat."""
    areas = np.array([np.pi * 1e-4] + [2 * np.pi * 1e-4] * 3 + [np.pi * 1e-4])
    eps = np.array([1.0, 0.6, 0.6, 0.6, 0.6])
    T = np.array([293.15, 1273.15, 1273.15, 1273.15, 1273.15])
    AA, bb, J, E, T_out, q, Q = radiosity_rtvf(HOLMAN_VF, areas, eps, T=T)
    # global energy balance: what the aperture gains, the walls lose
    np.testing.assert_allclose(Q.sum(), 0.0, atol=1e-8 * np.abs(Q).max())
    assert Q[0] < 0.0            # aperture is a net sink
    assert (Q[1:] > 0.0).all()   # hot walls are net sources
    # radiosities of hot walls lie between J_min and blackbody emission
    sigma = 5.6677e-8
    assert (J[1:] < sigma * 1273.15**4).all()
    assert (J[1:] > 0.5 * sigma * 1273.15**4).all()


def test_radiosity_flux_bc():
    """Mixed BC: flux-specified element recovers a temperature."""
    areas = np.ones(2)
    eps = np.array([0.8, 0.8])
    VF = np.array([[0.0, 1.0], [1.0, 0.0]])  # two infinite parallel plates
    T = np.array([500.0, np.nan])
    inc = np.array([np.nan, 1000.0])
    AA, bb, J, E, T_out, q, Q = radiosity_rtvf(VF, areas, eps, T=T,
                                               inc_radiation=inc)
    assert np.isfinite(T_out).all() and T_out[1] > 0


def test_cavity_builder_closes():
    """The cavity scene traced from the aperture absorbs everything (one
    bounce, absorptivity 1): closed geometry."""
    import jax
    from tracer_tpu.engine import TracerEngine, TraceOptions
    from tracer_tpu.sources import disk_bundle
    asm = build_two_n_cavity(0.5, [1.0, 1.0], [0.5, 1.0], 0.5)
    eng = TracerEngine(asm)
    bund = disk_bundle(jax.random.PRNGKey(1), 5000, center=[0, 0, 0],
                       direction=[0, 0, 1.0], radius=0.5,
                       ang_range=np.pi / 2, flux=1.0 / (np.pi * 0.25))
    res = eng.ray_tracer(bund, reps=1, key=jax.random.PRNGKey(2),
                         opts=TraceOptions(max_bounces=1))
    bal = res.energy_balance()
    # every ray lands somewhere inside the cavity
    np.testing.assert_allclose(bal["escaped"], 0.0, atol=1e-9)
    np.testing.assert_allclose(bal["absorbed"], bal["source"], rtol=1e-9)
