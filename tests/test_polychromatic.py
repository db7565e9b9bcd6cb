"""Polychromatic rays: per-ray spectra over a shared wavelength grid.

Reference parity: rays carry full spectra that spectral managers multiply
(optics_callables.py:137-138 / :393) and PolychromaticAccountant records
(:1825). Here ``RayBundle.with_spectra`` attaches (N, K) spectra + one
(K,) grid, the host-stepped engine filters them through K_REFLECT_SPECTRAL
tables (energy = trapezoid of the filtered spectrum — the polychromatic
integral IS the accounting), scalar interactions scale them, and
``hits_of`` exposes per-hit outgoing spectra.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracer_tpu import geometry as G
from tracer_tpu import materials as M
from tracer_tpu import spatial
from tracer_tpu.bundle import RayBundle
from tracer_tpu.engine import TracerEngine
from tracer_tpu.scene import Assembly, AssembledObject, Surface


def _two_band_bundle(n, grid):
    """Rays straight down at a 45-degree spectral mirror; spectrum = a
    blue box + a red box of different heights."""
    spectra = np.where(grid < 600e-9, 2.0e9, 1.0e9)   # W/m
    spectra = np.tile(spectra, (n, 1))
    b = RayBundle.create(pos=np.tile([0.0, 0.0, 1.0], (n, 1)),
                         dir=np.tile([0.0, 0.0, -1.0], (n, 1)))
    return b.with_spectra(grid, spectra)


def test_two_band_receiver_matches_analytic():
    """A spectral mirror (alpha = 0.6 blue / 0.1 red) redirects a
    two-band beam into a recording receiver: every per-hit spectrum, the
    receiver power and the energy closure match the hand-computed
    trapezoids exactly."""
    grid = np.linspace(400e-9, 800e-9, 41)
    alpha = np.where(grid < 600e-9, 0.6, 0.1)
    mirror = Surface(G.rect_plate(2.0, 2.0),
                     M.reflective_spectral(alpha, grid),
                     rotation=spatial.rotx(-np.pi / 4)[:3, :3],
                     name="mirror")
    rec = Surface(G.rect_plate(4.0, 4.0),
                  M.with_accounting(M.absorber(one_sided=False),
                                    "location", "absorption",
                                    "polychromatic"),
                  location=[0.0, 3.0, 0.0],
                  rotation=spatial.rotx(np.pi / 2)[:3, :3], name="rec")
    eng = TracerEngine(Assembly([AssembledObject([mirror, rec])]))

    n = 16
    bund = _two_band_bundle(n, grid)
    s_in = np.asarray(bund.spectra[0])
    e_in = np.trapezoid(s_in, grid)
    np.testing.assert_allclose(float(bund.energy[0]), e_in, rtol=1e-12)

    res = eng.ray_tracer(bund, reps=4, key=jax.random.PRNGKey(0))
    s_expect = s_in * (1.0 - alpha)
    e_expect = np.trapezoid(s_expect, grid)

    hits = res.hits_of("rec")
    assert hits["spectra"].shape == (n, len(grid))
    np.testing.assert_allclose(hits["spectra"], 0.0, atol=1e-9)  # absorbed
    np.testing.assert_allclose(hits["e_in"], e_expect, rtol=1e-6)
    np.testing.assert_allclose(hits["absorbed"].sum(), n * e_expect,
                               rtol=1e-6)

    m_hits = res.hits_of("mirror")
    # mirror hit records carry the FILTERED outgoing spectrum
    np.testing.assert_allclose(
        m_hits["spectra"], np.tile(s_expect, (n, 1)), rtol=1e-6)
    np.testing.assert_allclose(m_hits["absorbed"].sum(),
                               n * (e_in - e_expect), rtol=1e-6)
    # closure across the whole trace
    bal = (np.asarray(res.accum.absorbed).sum() + float(res.accum.escaped)
           + float(res.accum.culled) + float(res.accum.residual)
           + float(res.accum.medium))
    np.testing.assert_allclose(bal, n * e_in, rtol=1e-9)


def test_scalar_interactions_scale_spectra():
    """A gray (non-spectral) mirror with absorptivity 0.25 scales the
    whole spectrum uniformly; the trapezoid identity survives."""
    grid = np.linspace(400e-9, 800e-9, 21)
    mirror = Surface(G.rect_plate(2.0, 2.0), M.reflective(0.25),
                     name="mirror")
    eng = TracerEngine(Assembly([AssembledObject([mirror])]))
    bund = _two_band_bundle(4, grid)
    res = eng.ray_tracer(bund, reps=1, key=jax.random.PRNGKey(1))
    rec = res.records[0]
    np.testing.assert_allclose(
        np.asarray(rec.spectra), 0.75 * np.asarray(bund.spectra),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.trapezoid(np.asarray(rec.spectra), grid, axis=1),
        np.asarray(rec.e_out), rtol=1e-6)


def test_polychromatic_guards():
    """Streaming/fused drivers reject polychromatic bundles loudly, and
    piecewise (theta, wl) rows reject them at trace time."""
    from tracer_tpu.engine import trace_fused
    grid = np.linspace(400e-9, 800e-9, 11)
    mirror = Surface(G.rect_plate(2.0, 2.0), M.reflective(0.1))
    eng = TracerEngine(Assembly([AssembledObject([mirror])]))
    bund = _two_band_bundle(2, grid)
    with pytest.raises(NotImplementedError, match="host-stepped"):
        trace_fused(eng.scene, bund, jax.random.PRNGKey(0))
    pw = Surface(G.rect_plate(2.0, 2.0),
                 M.lambertian_directional_spectral_piecewise(
                     [0.0, np.pi / 2], [400e-9, 800e-9],
                     [[0.2, 0.3], [0.4, 0.5]]))
    eng2 = TracerEngine(Assembly([AssembledObject([pw])]))
    with pytest.raises(NotImplementedError, match="piecewise"):
        eng2.ray_tracer(bund, reps=1, key=jax.random.PRNGKey(0))


def test_compat_polychromatic_names():
    """The reference's polychromatic names resolve and carry the
    polychromatic record tag (ref PolychromaticAccountant :1825)."""
    from tracer_tpu import compat
    spec = compat.ReflectivePolychromatic(0.1)
    assert "polychromatic" in spec.record
    spec = compat.Lambertian_directional_axisymmetric_piecewise_Polychromatic(
        [0.0, np.pi / 2], [[0.2, 0.3], [0.4, 0.5]], [400e-9, 800e-9])
    assert spec.kind == M.K_LAMBERTIAN_PIECEWISE
