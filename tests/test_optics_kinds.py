"""Tests for the optics kinds added in round 2: FresnelConductorHomogenous,
RefractiveTransmissiveHomogenous and the piecewise directional/spectral
Lambertian family (VERDICT round 1, item 3)."""
import numpy as np
import jax
import jax.numpy as jnp

from tracer_tpu import TracerEngine
from tracer_tpu import geometry as G
from tracer_tpu import materials as M
from tracer_tpu.scene import Assembly, AssembledObject, Surface
from tracer_tpu.sources import disk_bundle


def _plate_scene(optics, name="plate"):
    surf = Surface(G.rect_plate(50.0, 50.0), optics, name=name)
    return Assembly([AssembledObject([surf])])


def _rays_at(theta, n=4096, wavelength=None, z0=2.0):
    """Bundle hitting the z=0 plate at incidence angle theta (from +z)."""
    d = np.array([np.sin(theta), 0.0, -np.cos(theta)])
    b = disk_bundle(jax.random.PRNGKey(0), n, center=(-z0 * d).tolist(),
                    direction=d.tolist(), radius=0.5, ang_range=1e-9,
                    flux=1.0 / (np.pi * 0.25))
    if wavelength is not None:
        b = b.replace(wavelength=jnp.full((n,), wavelength))
    return b


def _fresnel_conductor_R(n1, m2, th1):
    """Analytic randomly-polarized conductor reflectance (Modest ch.2)."""
    n2, k2 = m2.real, m2.imag
    s1 = n1 * np.sin(th1)
    b = n2**2 - k2**2 - s1**2
    a = np.sqrt(b**2 + 4.0 * (n2 * k2) ** 2)
    p = np.sqrt(0.5 * (a + b))
    q = np.sqrt(max(0.5 * (a - b), 0.0))
    c1 = n1 * np.cos(th1)
    R_s = ((c1 - p) ** 2 + q**2) / ((c1 + p) ** 2 + q**2)
    st = s1 * np.tan(th1)
    R_p = ((p - st) ** 2 + q**2) / ((p + st) ** 2 + q**2) * R_s
    return 0.5 * (R_p + R_s)


def test_fresnel_conductor_energy_matches_analytic():
    m2 = 0.9 + 6.2j   # silver-ish in the visible
    for th in (0.0, 0.7, 1.3):
        asm = _plate_scene(M.fresnel_conductor_homogenous(1.0, m2))
        eng = TracerEngine(asm)
        bundle = _rays_at(th, wavelength=600e-9)
        res = eng.ray_tracer(bundle, reps=1)
        e0 = float(np.asarray(bundle.energy).sum())
        absorbed = float(np.asarray(res.accum.absorbed).sum())
        R = _fresnel_conductor_R(1.0, m2, th)
        np.testing.assert_allclose(absorbed / e0, 1.0 - R, rtol=1e-5)
        # direction is specular
        rec = res.records[0]
        d_out = np.asarray(rec.dir_out)
        exp = np.array([np.sin(th), 0.0, np.cos(th)])
        np.testing.assert_allclose(d_out.mean(axis=0), exp, atol=1e-6)


def test_fresnel_conductor_dispersive_material():
    """n(lambda), k(lambda) tables are interpolated per ray."""
    wls = np.array([400e-9, 800e-9])
    ns = np.array([1.0, 2.0])
    ks = np.array([4.0, 8.0])
    asm = _plate_scene(M.fresnel_conductor_homogenous(1.0, (wls, ns, ks)))
    eng = TracerEngine(asm)
    for wl in (400e-9, 600e-9, 800e-9):
        bundle = _rays_at(0.3, n=512, wavelength=wl)
        res = eng.ray_tracer(bundle, reps=1)
        e0 = float(np.asarray(bundle.energy).sum())
        absorbed = float(np.asarray(res.accum.absorbed).sum())
        m2 = complex(np.interp(wl, wls, ns), np.interp(wl, wls, ks))
        R = _fresnel_conductor_R(1.0, m2, 0.3)
        np.testing.assert_allclose(absorbed / e0, 1.0 - R, rtol=1e-5)


def test_refractive_transmissive_attenuates_inside():
    """Slab of n=1.5 glass with attenuation inside: transmitted energy
    matches Fresnel + Beer-Lambert expectation (RefractiveTransmissive
    = RefractiveHomogenous + Absorbant, ref optics_callables.py:1326)."""
    att = 40.0       # 1/m
    depth = 0.02     # 2 cm slab
    top = Surface(G.rect_plate(10.0, 10.0),
                  M.refractive_transmissive_homogenous(1.0, 1.5, (0.0, att)),
                  name="top")
    bot = Surface(G.rect_plate(10.0, 10.0),
                  M.refractive_transmissive_homogenous(1.0, 1.5, (0.0, att)),
                  location=[0.0, 0.0, -depth], name="bot")
    asm = Assembly([AssembledObject([top, bot])])
    eng = TracerEngine(asm)
    n = 20000
    bundle = _rays_at(0.0, n=n)
    res = eng.ray_tracer(bundle, reps=30, key=jax.random.PRNGKey(3))
    bal = res.energy_balance()
    assert abs(bal["closure"]) < 1e-9 * bal["source"]
    # normal incidence: R = (0.5/2.5)^2 = 0.04 per face; the medium term
    # collects the Beer-Lambert loss over every internal traversal
    R = 0.04
    T_slab = np.exp(-att * depth)
    # series over internal bounces: transmitted fraction
    trans = (1 - R) ** 2 * T_slab / (1.0 - (R * T_slab) ** 2)
    got = bal["escaped"] / bal["source"]
    # escaped includes the directly reflected R as well
    refl = R + (1 - R) ** 2 * R * T_slab**2 / (1.0 - (R * T_slab) ** 2)
    np.testing.assert_allclose(got, trans + refl, rtol=0.02)
    assert bal["medium"] / bal["source"] > 0.5 * (1 - T_slab)


def test_lambertian_directional_piecewise_absorptance():
    thetas = np.array([0.0, np.pi / 4, np.pi / 2])
    abss = np.array([0.2, 0.4, 0.9])
    asm = _plate_scene(M.lambertian_directional_piecewise(thetas, abss))
    eng = TracerEngine(asm)
    for th, exp in ((0.0, 0.2), (np.pi / 8, 0.3), (np.pi / 4, 0.4),
                    (3 * np.pi / 8, 0.65)):
        bundle = _rays_at(th, n=1024)
        res = eng.ray_tracer(bundle, reps=1)
        e0 = float(np.asarray(bundle.energy).sum())
        absorbed = float(np.asarray(res.accum.absorbed).sum())
        np.testing.assert_allclose(absorbed / e0, exp, rtol=1e-5)
    # outgoing directions are hemispherical diffuse (cosine-weighted):
    # mean cos(theta_out) = 2/3
    rec = res.records[0]
    cz = np.asarray(rec.dir_out)[:, 2]
    assert (cz > 0).all()
    np.testing.assert_allclose(cz.mean(), 2.0 / 3.0, atol=0.03)


def test_lambertian_piecewise_directional_specularity():
    """Theta-dependent specularity: fully specular below 45 deg, fully
    diffuse above (ref Lambertian_piecewise_Specular_... :457)."""
    thetas = np.array([0.0, np.pi / 4 - 1e-3, np.pi / 4, np.pi / 2])
    abss = np.zeros(4)
    spec = np.array([1.0, 1.0, 0.0, 0.0])
    asm = _plate_scene(M.lambertian_directional_piecewise(thetas, abss,
                                                          spec))
    eng = TracerEngine(asm)
    b1 = _rays_at(0.2, n=512)
    res = eng.ray_tracer(b1, reps=1, key=jax.random.PRNGKey(1))
    d = np.asarray(res.records[0].dir_out)
    exp = np.array([np.sin(0.2), 0.0, np.cos(0.2)])
    np.testing.assert_allclose(d, np.tile(exp, (512, 1)), atol=1e-6)
    b2 = _rays_at(1.2, n=4096)
    res = eng.ray_tracer(b2, reps=1, key=jax.random.PRNGKey(2))
    d = np.asarray(res.records[0].dir_out)
    # diffuse: spread over the hemisphere, not the specular direction
    assert np.std(d[:, 1]) > 0.3


def test_lambertian_spectral_piecewise_bilinear():
    thetas = np.array([0.0, np.pi / 2])
    wls = np.array([400e-9, 800e-9])
    grid = np.array([[0.1, 0.5],
                     [0.3, 0.7]])
    asm = _plate_scene(M.lambertian_directional_spectral_piecewise(
        thetas, wls, grid))
    eng = TracerEngine(asm)
    cases = [(0.0, 400e-9, 0.1), (0.0, 600e-9, 0.3),
             (np.pi / 4, 600e-9, 0.4), (np.pi / 4, 800e-9, 0.6)]
    for th, wl, exp in cases:
        bundle = _rays_at(th, n=512, wavelength=wl)
        res = eng.ray_tracer(bundle, reps=1)
        e0 = float(np.asarray(bundle.energy).sum())
        absorbed = float(np.asarray(res.accum.absorbed).sum())
        np.testing.assert_allclose(absorbed / e0, exp, rtol=1e-4)


def test_compat_names_resolve():
    from tracer_tpu import compat as opt
    s = opt.FresnelConductorHomogenous(1.0, 1.0 + 5.0j)
    assert s.kind == M.K_FRESNEL_CONDUCTOR
    s = opt.RefractiveTransmissiveHomogenous(1.0, 1.5, 10.0)
    assert s.kind == M.K_REFRACTIVE
    s = opt.Lambertian_directional_axisymmetric_piecewise(
        [0.0, 1.0], [0.1, 0.2])
    assert s.kind == M.K_LAMBERTIAN_PIECEWISE
    s = opt.Lambertian_directional_axisymmetric_piecewise_spectral(
        [0.0, 1.0], [[0.1, 0.2], [0.3, 0.4]], [4e-7, 8e-7])
    assert s.kind == M.K_LAMBERTIAN_PIECEWISE
    s = opt.LambertianSpecular_directional_axisymmetric_piecewise(
        [0.0, 1.0], [0.1, 0.2], 0.5)
    assert float(s.params[2]) == 0.5
    s = opt.Lambertian_piecewise_Specular_directional_axisymmetric_piecewise(
        [0.0, 1.0], [0.1, 0.2], [0.9, 0.1])
    assert s.kind == M.K_LAMBERTIAN_PIECEWISE
    s = opt.BDRF_Cook_Torrance_isotropic(0.2, 1.1, 6.0)
    assert s.kind == M.K_COOK_TORRANCE
    s = opt.Reflective_IAM(0.1, a_r=0.16)
    assert s.flags & M.F_IAM
    # accountant-suffix parsing still composes with the new bases
    s = opt.FresnelConductorHomogenousReceiver(1.0, 1.0 + 5.0j)
    assert "absorption" in s.record


def test_iam_c_exponent_matches_analytic():
    """The Martin-Ruiz exponent c (ref IAM.__init__ optics_callables.py:272,
    energy *= 1 - abs*(1-exp(-cos^c/a_r))/(1-exp(-1/a_r))) applies on the
    general path: at 60 deg with c = 2 the first hit absorbs
    0.4 * (1-e^-0.25)/(1-e^-1) = 0.1400 (c = 1 would give 0.2490)."""
    for c, cos_c in ((1.0, 0.5), (2.0, 0.25)):
        asm = _plate_scene(M.iam(M.reflective(0.4), a_r=1.0, c=c))
        eng = TracerEngine(asm)
        bundle = _rays_at(np.pi / 3)
        res = eng.ray_tracer(bundle, reps=1)
        e0 = float(np.asarray(bundle.energy).sum())
        absorbed = float(np.asarray(res.accum.absorbed).sum())
        iam_f = (1.0 - np.exp(-cos_c)) / (1.0 - np.exp(-1.0))
        np.testing.assert_allclose(absorbed / e0, 0.4 * iam_f, rtol=1e-5)


def test_iam_base_kinds_feature_tags():
    """Which IAM bases ride the fused megakernels (round 4/5): reflective,
    Lambertian, LambertianSpecular and SemiLambertian bases are
    mirror-packable, with ANY single Martin-Ruiz exponent c (c is a
    compile-time constant of the scene, baked as cos^c into the fused
    epilogue — round-5 trigger retirement); any other base — or MIXED
    exponents across rows — tags "iam_nonmirror" and stays on the
    general path."""
    from tracer_tpu.scene import compile_scene

    def feats(opt):
        table, _ = compile_scene(_plate_scene(opt))
        return table

    for opt in (M.iam(M.reflective(0.4), a_r=0.16),
                M.iam(M.lambertian(0.4), a_r=0.16),
                M.iam(M.lambertian_specular(0.4, 0.7), a_r=0.16),
                M.iam(M.semi_lambertian(0.4, 0.5), a_r=0.16)):
        t = feats(opt)
        assert "iam" in t.features and "iam_nonmirror" not in t.features
    t = feats(M.iam(M.reflective(0.4), a_r=0.16, c=2.0))
    assert "iam" in t.features and "iam_nonmirror" not in t.features
    assert t.iam_c == 2.0
    t = feats(M.iam(M.bdrf_cook_torrance(0.2, 1.1, 6.0), a_r=0.16))
    assert "iam" in t.features and "iam_nonmirror" in t.features
    # mixed exponents cannot bake one static c
    from tracer_tpu import geometry as G
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene as cs)
    a = Surface(G.rect_plate(1, 1), M.iam(M.reflective(0.4), 0.16, c=1.0))
    b = Surface(G.rect_plate(1, 1), M.iam(M.reflective(0.4), 0.16, c=2.0),
                location=[3.0, 0.0, 0.0])
    t, _ = cs(Assembly([AssembledObject([a, b])]))
    assert "iam_nonmirror" in t.features


def test_bifacial_mirror_and_transparent_backs():
    """Bifacial rows are visible only from their own face
    (F_BACKSIDE_MISS): a mirror or transparent BACK must reflect / pass
    rays, not die to the front row's coincident-tie one-sided kill
    (regression: back-face rays were zeroed regardless of back optics)."""
    from tracer_tpu.bundle import RayBundle

    b = RayBundle.create(pos=[[0.0, 0.0, -1.0]], dir=[[0.0, 0.0, 1.0]])
    opt = M.bifacial(M.absorber(), M.reflective(0.0))
    eng = TracerEngine(Assembly(objects=[AssembledObject(
        surfs=[Surface(G.rect_plate(2, 2), opt)])]))
    res = eng.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
    rec = res.records[0]
    assert float(np.asarray(rec.e_out)[0]) == 1.0
    np.testing.assert_allclose(np.asarray(rec.dir_out)[0], [0, 0, -1.0])

    opt2 = M.bifacial(M.absorber(), M.transparent())
    eng2 = TracerEngine(Assembly(objects=[AssembledObject(
        surfs=[Surface(G.rect_plate(2, 2), opt2)])]))
    res2 = eng2.ray_tracer(b, reps=3, key=jax.random.PRNGKey(0))
    assert float(res2.accum.escaped) == 1.0        # passed through
    b2 = RayBundle.create(pos=[[0.0, 0.0, 1.0]], dir=[[0.0, 0.0, -1.0]])
    res3 = eng2.ray_tracer(b2, reps=3, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(np.asarray(res3.accum.absorbed).sum()), 1.0, atol=1e-12)
