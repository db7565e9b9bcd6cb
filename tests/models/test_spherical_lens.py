"""Spherical lens test: paraxial ray reaches the lensmaker focus through a
real trace (cf. ref tests/models/test_spherical_lens.py:18-31)."""
import jax
import numpy as np

from tracer_tpu import TracerEngine
from tracer_tpu.bundle import RayBundle
from tracer_tpu.models.spherical_lens import SphericalLens
from tracer_tpu.scene import Assembly, AssembledObject


def test_focal_length_biconvex():
    # symmetric biconvex lens, n=1.5, R=100mm, thin
    lens = SphericalLens(diameter=0.05, depth=0.005, R1=0.1, R2=-0.1,
                         refr_idx=1.5)
    f = lens.focal_length()
    # thin-lens estimate: 1/f = (n-1)(1/R1 - 1/R2) -> f ~ 0.1
    assert abs(f - 0.1) < 0.005


def test_paraxial_ray_crosses_axis_at_focus():
    lens = SphericalLens(diameter=0.05, depth=0.005, R1=0.1, R2=-0.1,
                         refr_idx=1.5)
    eng = TracerEngine(Assembly(objects=[lens]))
    f = lens.focal_length()

    # a slightly off-axis paraxial ray going down +Z
    h = 2e-3
    n = 256  # many copies: Russian-roulette splits reflect/refract randomly
    bund = RayBundle.create(pos=np.tile([h, 0.0, 0.5], (n, 1)),
                            dir=np.tile([0.0, 0.0, -1.0], (n, 1)))
    res = eng.ray_tracer(bund, reps=4, key=jax.random.PRNGKey(0))
    fin = res.final
    d = np.asarray(fin.dir)
    p = np.asarray(fin.pos)
    # live rays that refracted through both faces travel downward with
    # negative x-slope; find axis crossing
    going_down = d[:, 2] < -0.9
    bent = going_down & (d[:, 0] < -1e-4)
    assert bent.sum() > n // 2   # most rays transmit (R ~ 4% per face)
    s = -p[bent, 0] / d[bent, 0]
    z_cross = p[bent, 2] + s * d[bent, 2]
    # back principal point at z=0 -> focus at z=-f
    np.testing.assert_allclose(np.median(z_cross), -f, atol=0.002)


def test_dispersive_lens_chromatic_focus():
    """refr_idx may be a (wavelengths, n) table (or optical_constants
    material): the faces become dispersive interfaces and paraxial rays
    of each color cross the axis at their OWN lensmaker focus (ref
    material-based Refractive, optics_callables.py:726)."""
    wls = np.array([400e-9, 700e-9])
    ns = np.array([1.6, 1.4])
    lens = SphericalLens(diameter=0.05, depth=0.005, R1=0.1, R2=-0.1,
                         refr_idx=(wls, ns))
    assert "dispersive" in TracerEngine(Assembly(objects=[lens])) \
        .scene.features
    f_b = lens.focal_length(wavelength=400e-9)
    f_r = lens.focal_length(wavelength=700e-9)
    assert f_b < lens.focal_length() < f_r

    eng = TracerEngine(Assembly(objects=[lens]))
    h, n = 2e-3, 256
    for wl, f_exp in ((400e-9, f_b), (700e-9, f_r)):
        bund = RayBundle.create(pos=np.tile([h, 0.0, 0.5], (n, 1)),
                                dir=np.tile([0.0, 0.0, -1.0], (n, 1)),
                                wavelength=np.full(n, wl))
        res = eng.ray_tracer(bund, reps=4, key=jax.random.PRNGKey(0))
        fin = res.final
        d = np.asarray(fin.dir)
        p = np.asarray(fin.pos)
        bent = (d[:, 2] < -0.9) & (d[:, 0] < -1e-4)
        assert bent.sum() > n // 2
        s = -p[bent, 0] / d[bent, 0]
        z_cross = p[bent, 2] + s * d[bent, 2]
        np.testing.assert_allclose(np.median(z_cross), -f_exp, atol=0.003)
