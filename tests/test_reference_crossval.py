"""Cross-validation against the ACTUAL reference implementation.

The upstream pure-NumPy Tracer (/root/reference) core trace path is
Python-3 clean; these tests run the same scenario through BOTH engines
and require statistical agreement — the strongest parity evidence there
is, beyond re-deriving expected values.

The reference's polygon sampling imports shapely (absent here); a stub
module satisfies the import — nothing in these scenarios touches it.
"""
import os

import numpy as np
import pytest
import jax

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def reference():
    # single source of truth for the shapely stub + sys.path setup
    from benchmarks.reference_numpy import _setup_reference
    _setup_reference(REF)
    import tracer  # noqa: F401  (the reference package)
    return REF


def _ref_minidish(reference, n_rays, seed):
    """Trace the reference MiniDish (the benchmark's scene builder, so
    benchmark and cross-validation always trace the same scenario);
    returns (receiver_hist, edges, source_energy)."""
    from benchmarks.reference_numpy import build_ref_minidish
    from tracer.tracer_engine import TracerEngine

    asm, sun = build_ref_minidish(n_rays, seed)
    src_e = float(sun.get_energy().sum())
    eng = TracerEngine(asm)
    eng.ray_tracer(sun, 100, 1e-6)
    H, xb, yb = asm.histogram_hits(bins=10)
    return H, (xb, yb), src_e


def _tpu_minidish(n_rays, seed):
    """Same scenario through tracer_tpu (CPU float64 oracle path)."""
    from tracer_tpu import TracerEngine, spatial
    from tracer_tpu.models.tau_minidish import MiniDish
    from tracer_tpu.sources import disk_bundle

    asm = MiniDish(5.0, 6.25, 0.9, 6.95, 0.4, 0.7, 0.9)
    asm.set_transform(spatial.rotx(-np.pi / 4))
    sun = disk_bundle(jax.random.PRNGKey(seed), n_rays,
                      center=[0.0, 7.0, 7.0],
                      direction=[0.0, -2**-0.5, -2**-0.5],
                      radius=3.0, ang_range=0.005, flux=1000.0)
    src_e = float(np.asarray(sun.energy).sum())
    eng = TracerEngine(asm)
    res = eng.ray_tracer(sun, reps=100, min_energy=1e-6,
                         key=jax.random.PRNGKey(seed + 1))
    H, xb, yb = asm.histogram_hits(res, bins=10)
    return H, (xb, yb), src_e, res


def test_minidish_matches_reference_engine(reference):
    """Receiver power and flux map from the reference's own engine agree
    with tracer_tpu within MC error on the examples/test_case.py scenario
    (dish + 4-wall homogenizer + receiver, 3 optics kinds, 4 bounces)."""
    n = 60_000
    H_ref, _, se_ref = _ref_minidish(reference, n, seed=0)
    H_tpu, _, se_tpu, res = _tpu_minidish(n, seed=1)

    # identical source normalization
    np.testing.assert_allclose(se_ref, se_tpu, rtol=1e-9)

    # total receiver power within 3 sigma of the MC counting error
    tot_ref, tot_tpu = H_ref.sum(), H_tpu.sum()
    # ~n_hits deposits of ~e_ray*0.81 each; sigma_total ~ tot/sqrt(n_hits)
    e_dep = 0.81 * se_ref / n
    n_hits = tot_ref / e_dep
    sigma = np.sqrt(2.0) * tot_ref / np.sqrt(n_hits)   # two independent runs
    assert abs(tot_ref - tot_tpu) < 3.0 * sigma, (tot_ref, tot_tpu, sigma)

    # flux-map shape: per-cell 3-sigma agreement on populated cells
    c_ref = np.maximum(H_ref / e_dep, 1.0)
    c_tpu = np.maximum(H_tpu / e_dep, 1.0)
    mask = (c_ref + c_tpu) > 40
    assert mask.sum() > 50
    diff = (H_ref - H_tpu)[mask]
    sig = np.sqrt((H_ref**2 / c_ref + H_tpu**2 / c_tpu))[mask]
    rms_diff = float(np.sqrt(np.mean(diff**2)))
    rms_sig = float(np.sqrt(np.mean(sig**2)))
    assert rms_diff < 3.0 * rms_sig, (rms_diff, rms_sig)

    # and the tracer_tpu energy balance closes exactly (the reference
    # only warns about residual energy)
    bal = res.energy_balance()
    assert abs(bal["closure"]) < 1e-9 * bal["source"]


def test_nsttf_field_matches_reference_engine(reference):
    """Field-scale cross-validation on the headline workload: the
    reference engine and tracer_tpu trace the same 218-heliostat Sandia
    field (identical tracking, receiver and Buie source geometry) and
    must agree on the receiver interception fraction within MC error."""
    from tracer.tracer_engine import TracerEngine as RefEngine

    from benchmarks.nsttf import build_scene, make_source_fn, nsttf_positions
    from benchmarks.nsttf import solar_vector
    from benchmarks.reference_numpy import build_ref_nsttf, ref_nsttf_source
    from tracer_tpu.engine import trace_streaming

    n = 40_000
    pos = nsttf_positions(218)
    sun = solar_vector(0.0, np.pi / 6)

    # ---- reference engine (the benchmark's shared scene builder)
    asm, rec, center, extent = build_ref_nsttf(pos)
    bundle = ref_nsttf_source(n, center, sun, extent, seed=2)
    se_ref = float(bundle.get_energy().sum())
    RefEngine(asm).ray_tracer(bundle, 8, 1e-6)
    hits = rec.get_surfaces()[0]._opt.get_all_hits()
    frac_ref = float(hits[0].sum()) / se_ref

    # ---- tracer_tpu (CPU oracle path, same scene builder as bench.py)
    table, meta, info = build_scene()
    source_fn = make_source_fn(info, n)
    a, em, se = trace_streaming(table, source_fn, jax.random.PRNGKey(0),
                                total_rays=n, max_rounds=60, max_path=8)
    rows = np.nonzero(meta.row_logical == meta.index_of("receiver"))[0]
    frac_tpu = float(np.asarray(a.absorbed)[rows].sum()) / float(se)

    # 3-sigma MC band on the interception fraction of two independent runs
    n_hits = frac_ref * n / 0.9
    sigma = np.sqrt(2.0) * frac_ref / np.sqrt(n_hits)
    assert frac_ref > 0.05    # the field actually hits the tower
    assert abs(frac_ref - frac_tpu) < 3.0 * sigma, \
        (frac_ref, frac_tpu, sigma)


def test_curved_field_matches_reference_engine(reference):
    """Curved-facet cross-validation: slant-focused PARABOLIC heliostats
    (the reference's RectangularParabolicDishGM vs tracer_tpu's
    parab-class quadric rows) must agree on the receiver interception —
    focusing raises it well above the flat-facet field's, so this is a
    sharp test of the curved-surface solve and tracking."""
    from tracer.tracer_engine import TracerEngine as RefEngine

    from benchmarks.nsttf import (make_source_fn, nsttf_positions,
                                  solar_vector)
    from benchmarks.reference_numpy import build_ref_nsttf, ref_nsttf_source
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.models.heliostat_field import HeliostatField as TpuField
    from tracer_tpu.models.one_sided_mirror import (one_sided_receiver
                                                    as tpu_receiver)
    from tracer_tpu.scene import Assembly, compile_scene
    from tracer_tpu import spatial as sp
    import jax.numpy as jnp

    n = 40_000
    n_h = 60
    tower_height = 60.0
    pos = nsttf_positions(n_h)
    center = pos.mean(axis=0)
    slant = np.hypot(np.hypot(pos[:, 0], pos[:, 1]), tower_height)
    sun = solar_vector(0.0, np.pi / 6)
    aim_dir = np.array([center[0], center[1], -tower_height * 0.75])
    aim_dir /= np.linalg.norm(aim_dir)

    # ---- reference engine (RectangularParabolicDishGM facets via the
    # benchmark's shared scene builder)
    asm, rec, center, extent = build_ref_nsttf(pos, focal_lengths=slant)
    bundle = ref_nsttf_source(n, center, sun, extent, seed=3)
    se_ref = float(bundle.get_energy().sum())
    RefEngine(asm).ray_tracer(bundle, 8, 1e-6)
    hits = rec.get_surfaces()[0]._opt.get_all_hits()
    frac_ref = float(hits[0].sum()) / se_ref

    # ---- tracer_tpu (parab-class quadric rows)
    f2 = TpuField(pos, width=6.1, height=6.1, absorptivity=0.1,
                  sigma=1.5e-3, bi_var=True, focal_lengths=slant)
    f2.set_aim_height(tower_height)
    f2.track_sun(azimuth=0.0, zenith=np.pi / 6)
    _, rec2 = tpu_receiver(11.0, 11.0)
    rec2.set_transform(sp.translate(0, 0, tower_height)
                       @ sp._homog(sp.rotation_to_z(aim_dir)))
    table, meta = compile_scene(Assembly(objects=[rec2],
                                         subassemblies=[f2]),
                                dtype=jnp.float32)
    assert "parab" in [g[3] for g in table.groups]
    source_fn = make_source_fn(dict(positions=pos, sun=sun), n)
    a, em, se = trace_streaming(table, source_fn, jax.random.PRNGKey(4),
                                total_rays=n, max_rounds=60, max_path=8)
    rows = np.nonzero(meta.row_logical == meta.index_of("receiver"))[0]
    frac_tpu = float(np.asarray(a.absorbed)[rows].sum()) / float(se)

    n_hits = frac_ref * n / 0.9
    sigma = np.sqrt(2.0) * frac_ref / np.sqrt(n_hits)
    assert frac_ref > 0.04   # the focused field actually hits the tower
    assert abs(frac_ref - frac_tpu) < 3.0 * sigma, \
        (frac_ref, frac_tpu, sigma)


def test_spectral_reflectance_matches_reference(reference):
    """Wavelength-interpolated absorptance: the reference's
    Reflective_spectral (np.interp over the table) vs tracer_tpu's
    K_REFLECT_SPECTRAL segment interpolation — outgoing energies equal
    to float round-off per ray, including the clamped out-of-range
    wavelengths."""
    import numpy as N
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.flat_surface import RectPlateGM
    from tracer import optics_callables as opt
    from tracer.ray_bundle import RayBundle as RefBundle

    wls_tab = np.array([400e-9, 700e-9, 1200e-9, 2500e-9])
    abss = np.array([0.05, 0.20, 0.10, 0.40])
    # probe wavelengths: interior, on-node, below and above the table
    ws = np.array([300e-9, 400e-9, 550e-9, 900e-9, 2500e-9, 3000e-9])
    n = len(ws)

    surf = RefSurface(RectPlateGM(4.0, 4.0),
                      opt.Reflective_spectral(abss, wls_tab))
    asm = RefAssembly(objects=[RefObject(surfs=[surf])])
    pos = np.stack([np.linspace(-1, 1, n), np.zeros(n), np.ones(n)])
    d = np.tile([[0.0], [0.0], [-1.0]], (1, n))
    bundle = RefBundle(vertices=pos, directions=d, energy=np.ones(n),
                       wavelengths=ws.copy())
    eng = RefEngine(asm)
    eng.ray_tracer(bundle, 1, 1e-10)
    e_ref = np.asarray(eng.tree._bunds[1].get_energy())

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.engine import TracerEngine
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface)
    mirror = Surface(G.rect_plate(4.0, 4.0),
                     M.reflective_spectral(abss, wls_tab), name="m")
    eng2 = TracerEngine(Assembly([AssembledObject([mirror])]))
    b = RayBundle.create(pos=pos.T, dir=d.T, energy=np.ones(n),
                         wavelength=ws)
    res = eng2.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
    e_tpu = np.asarray(res.records[0].e_out)

    np.testing.assert_allclose(np.sort(e_tpu), np.sort(e_ref), rtol=1e-9)
    # and both equal the analytic 1 - interp(wl)
    np.testing.assert_allclose(
        e_tpu, 1.0 - np.interp(ws, wls_tab, abss), rtol=1e-9)


def test_flat_mirror_exact_against_reference(reference):
    """Deterministic single-ray comparison: a tilted flat mirror +
    receiver, traced by both engines — hit points agree to float64
    round-off (no MC statistics involved)."""
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.models.one_sided_mirror import rect_one_sided_mirror
    from tracer.ray_bundle import RayBundle as RefBundle
    from tracer.spatial_geometry import rotx as ref_rotx

    mirror = rect_one_sided_mirror(2.0, 2.0, absorptivity=0.3)
    mirror.set_transform(ref_rotx(np.pi / 6))
    sun = RefBundle(vertices=np.c_[[0.3, -0.2, 2.0]],
                    directions=np.c_[[0.0, 0.0, -1.0]],
                    energy=np.r_[1.0])
    eng = RefEngine(__import__("tracer.assembly", fromlist=["Assembly"])
                    .Assembly(objects=[mirror]))
    v_ref, d_ref = eng.ray_tracer(sun, 1, 1e-6)

    from tracer_tpu import TracerEngine, spatial
    from tracer_tpu.models.one_sided_mirror import rect_one_sided_mirror \
        as tpu_mirror
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.scene import Assembly

    m2 = tpu_mirror(2.0, 2.0, absorptivity=0.3)
    m2.set_transform(spatial.rotx(np.pi / 6))
    eng2 = TracerEngine(Assembly([m2]))
    b = RayBundle.create(pos=[[0.3, -0.2, 2.0]], dir=[[0.0, 0.0, -1.0]])
    res = eng2.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
    rec = res.records[0]
    # reflected direction and hit point match the reference exactly
    np.testing.assert_allclose(np.asarray(rec.hit)[0],
                               v_ref[:, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(rec.dir_out)[0],
                               d_ref[:, 0], atol=1e-12)
    np.testing.assert_allclose(float(np.asarray(rec.e_out)[0]), 0.7,
                               atol=1e-12)


def test_refractive_split_exact_against_reference(reference):
    """Deterministic two-branch Fresnel interface: one oblique ray onto a
    flat n1=1 / n2=1.5 boundary with ENERGY SPLITTING — both engines must
    produce the same refracted and reflected directions and energies to
    float64 round-off (ref Refractive single_ray=False,
    optics_callables.py:726; no MC statistics involved)."""
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.flat_surface import RectPlateGM
    from tracer import optics_callables as opt
    from tracer.ray_bundle import RayBundle as RefBundle

    d0 = np.array([0.3, 0.2, -0.9])
    d0 /= np.linalg.norm(d0)

    surf = RefSurface(RectPlateGM(4.0, 4.0),
                      opt.RefractiveHomogenous(1.0, 1.5, single_ray=False))
    asm = RefAssembly(objects=[RefObject(surfs=[surf])])
    bundle = RefBundle(vertices=np.c_[[0.0, 0.0, 1.0]],
                       directions=np.c_[d0], energy=np.r_[1.0],
                       ref_index=np.r_[1.0])
    eng = RefEngine(asm)
    eng.ray_tracer(bundle, 1, 1e-9)
    b1 = eng.tree._bunds[1]
    dirs_ref = np.asarray(b1.get_directions())   # (3, 2)
    e_ref = np.asarray(b1.get_energy())
    assert dirs_ref.shape[1] == 2                # both branches exist

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.engine import TracerEngine
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.scene import Assembly, AssembledObject, Surface

    s2 = Surface(G.rect_plate(4.0, 4.0),
                 M.refractive_homogenous(1.0, 1.5, single_ray=False))
    eng2 = TracerEngine(Assembly([AssembledObject([s2])]))
    b = RayBundle.create(pos=[[0.0, 0.0, 1.0]], dir=[d0.tolist()],
                         energy=[1.0], ref_index=[1.0])
    res = eng2.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
    rec = res.records[0]
    branches = [(np.asarray(rec.dir_out)[0],
                 float(np.asarray(rec.e_out)[0]))]       # refracted
    mask, se, sd = (np.asarray(a) for a in rec.split)
    assert bool(mask[0])
    branches.append((np.asarray(sd)[0], float(se[0])))   # reflected

    # R + T = 1 (no interface absorption) and each branch matches the
    # reference's by direction AND energy
    np.testing.assert_allclose(sum(e for _, e in branches), 1.0,
                               atol=1e-12)
    for d_t, e_t in branches:
        j = int(np.argmin(np.linalg.norm(dirs_ref.T - d_t, axis=1)))
        np.testing.assert_allclose(d_t, dirs_ref[:, j], atol=1e-12)
        np.testing.assert_allclose(e_t, e_ref[j], atol=1e-12)


def test_dispersive_refractive_exact_against_reference(reference):
    """Deterministic DISPERSIVE interface: two oblique rays (400 nm and
    700 nm) onto a flat boundary whose far side is a material with
    n(400 nm) = 1.6 linearly falling to n(700 nm) = 1.4, with energy
    splitting — both engines must produce identical per-wavelength
    refracted/reflected directions and energies to float64 round-off
    (ref material-based Refractive, optics_callables.py:726, which
    evaluates material.m(wavelengths) per ray)."""
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.flat_surface import RectPlateGM
    from tracer import optics_callables as opt
    from tracer.ray_bundle import RayBundle as RefBundle

    wls_tab = np.array([400e-9, 700e-9])
    ns_tab = np.array([1.6, 1.4])

    class _Mat:
        def __init__(self, fn):
            self._fn = fn

        def m(self, wl):
            return self._fn(np.asarray(wl, dtype=float))

    air = _Mat(lambda wl: np.ones_like(wl))
    glass = _Mat(lambda wl: np.interp(wl, wls_tab, ns_tab))

    d0 = np.array([0.3, 0.2, -0.9])
    d0 /= np.linalg.norm(d0)
    wls = np.array([400e-9, 700e-9])

    surf = RefSurface(RectPlateGM(4.0, 4.0),
                      opt.Refractive(air, glass, single_ray=False))
    asm = RefAssembly(objects=[RefObject(surfs=[surf])])
    bundle = RefBundle(vertices=np.tile([[0.0], [0.0], [1.0]], 2),
                       directions=np.c_[d0, d0], energy=np.r_[1.0, 1.0],
                       wavelengths=wls, ref_index=np.r_[1.0, 1.0])
    eng = RefEngine(asm)
    eng.ray_tracer(bundle, 1, 1e-9)
    b1 = eng.tree._bunds[1]
    dirs_ref = np.asarray(b1.get_directions())       # (3, 4)
    e_ref = np.asarray(b1.get_energy())
    wl_ref = np.asarray(b1.get_wavelengths())
    assert dirs_ref.shape[1] == 4                    # 2 rays x 2 branches

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.engine import TracerEngine
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.scene import Assembly, AssembledObject, Surface

    s2 = Surface(G.rect_plate(4.0, 4.0),
                 M.refractive_material(1.0, (wls_tab, ns_tab),
                                       single_ray=False))
    eng2 = TracerEngine(Assembly([AssembledObject([s2])]))
    b = RayBundle.create(pos=[[0.0, 0.0, 1.0]] * 2, dir=[d0.tolist()] * 2,
                         energy=[1.0, 1.0], wavelength=wls.tolist(),
                         ref_index=[1.0, 1.0])
    res = eng2.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
    rec = res.records[0]
    mask, se, sd = (np.asarray(a) for a in rec.split)
    assert mask.all()

    for i, wl in enumerate(wls):
        ref_rays = np.nonzero(np.isclose(wl_ref, wl))[0]
        assert len(ref_rays) == 2
        branches = [(np.asarray(rec.dir_out)[i],
                     float(np.asarray(rec.e_out)[i])),    # refracted
                    (sd[i], float(se[i]))]                # reflected
        np.testing.assert_allclose(sum(e for _, e in branches), 1.0,
                                   atol=1e-12)
        for d_t, e_t in branches:
            j = ref_rays[int(np.argmin(np.linalg.norm(
                dirs_ref[:, ref_rays].T - d_t, axis=1)))]
            np.testing.assert_allclose(d_t, dirs_ref[:, j], atol=1e-12)
            np.testing.assert_allclose(e_t, e_ref[j], atol=1e-12)


def test_cylinder_hits_exact_against_reference(reference):
    """Deterministic curved-geometry comparison: hand-placed rays onto a
    mirrored FiniteCylinder — hit points and reflected directions from
    both engines agree to float64 round-off (ref cylinder.py:59; tests
    the quadric solve + z-range aperture, not MC)."""
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.cylinder import FiniteCylinder
    from tracer import optics_callables as opt
    from tracer.ray_bundle import RayBundle as RefBundle

    pos = np.array([[3.0, 0.0, 0.3],     # radial hit at (1, 0, 0.3)
                    [0.0, -2.5, -0.6],   # radial hit from -y
                    [2.0, 2.0, 0.0]])    # oblique 45-degree approach
    dirs = np.array([[-1.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0],
                     [-2.0**-0.5, -2.0**-0.5, 0.0]])

    surf = RefSurface(FiniteCylinder(2.0, 2.0), opt.Reflective(0.4))
    asm = RefAssembly(objects=[RefObject(surfs=[surf])])
    bundle = RefBundle(vertices=pos.T.copy(), directions=dirs.T.copy(),
                       energy=np.ones(3))
    eng = RefEngine(asm)
    v_ref, d_ref = eng.ray_tracer(bundle, 1, 1e-9)

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.engine import TracerEngine
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.scene import Assembly, AssembledObject, Surface

    s2 = Surface(G.finite_cylinder(2.0, 2.0), M.reflective(0.4))
    eng2 = TracerEngine(Assembly([AssembledObject([s2])]))
    b = RayBundle.create(pos=pos, dir=dirs, energy=np.ones(3))
    res = eng2.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
    rec = res.records[0]
    hits = np.asarray(rec.hit)
    douts = np.asarray(rec.dir_out)
    eouts = np.asarray(rec.e_out)

    # match rays by position (the reference re-orders its outgoing bundle)
    for i in range(3):
        j = int(np.argmin(np.linalg.norm(v_ref.T - hits[i], axis=1)))
        np.testing.assert_allclose(hits[i], v_ref[:, j], atol=1e-12)
        np.testing.assert_allclose(douts[i], d_ref[:, j], atol=1e-12)
        np.testing.assert_allclose(eouts[i], 0.6, atol=1e-12)


def test_cone_and_frustum_hits_exact_against_reference(reference):
    """Deterministic cone-family comparison: rays onto a mirrored
    FiniteCone and a ConicalFrustum — hit points and reflected directions
    agree to float64 round-off (ref cone.py:74 :266; exercises the
    truncated-quadric root selection both engines implement)."""
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.cone import ConicalFrustum, FiniteCone
    from tracer import optics_callables as opt
    from tracer.ray_bundle import RayBundle as RefBundle

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.engine import TracerEngine
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.scene import Assembly, AssembledObject, Surface

    cases = [
        (FiniteCone(1.0, 2.0), G.finite_cone(1.0, 2.0),
         np.array([[3.0, 0.0, 1.0],      # side hit at z=1 (r=0.5)
                   [0.1, 3.0, 1.6]]),    # off-axis oblique hit
         np.array([[-1.0, 0.0, 0.0],
                   [0.0, -1.0, 0.0]])),
        (ConicalFrustum(-0.5, 0.4, 0.5, 1.0),
         G.conical_frustum(-0.5, 0.4, 0.5, 1.0),
         np.array([[3.0, 0.0, 0.2],
                   [-0.2, -3.0, -0.3]]),
         np.array([[-1.0, 0.0, 0.0],
                   [0.0, 1.0, 0.0]])),
    ]
    for ref_gm, tpu_geom, pos, dirs in cases:
        n = len(pos)
        surf = RefSurface(ref_gm, opt.Reflective(0.25))
        asm = RefAssembly(objects=[RefObject(surfs=[surf])])
        bundle = RefBundle(vertices=pos.T.copy(), directions=dirs.T.copy(),
                           energy=np.ones(n))
        v_ref, d_ref = RefEngine(asm).ray_tracer(bundle, 1, 1e-9)
        assert v_ref.shape[1] == n, "reference ray missed"

        s2 = Surface(tpu_geom, M.reflective(0.25))
        eng2 = TracerEngine(Assembly([AssembledObject([s2])]))
        b = RayBundle.create(pos=pos, dir=dirs, energy=np.ones(n))
        res = eng2.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
        rec = res.records[0]
        hits = np.asarray(rec.hit)
        douts = np.asarray(rec.dir_out)
        for i in range(n):
            j = int(np.argmin(np.linalg.norm(v_ref.T - hits[i], axis=1)))
            np.testing.assert_allclose(hits[i], v_ref[:, j], atol=1e-12)
            np.testing.assert_allclose(douts[i], d_ref[:, j], atol=1e-12)
            np.testing.assert_allclose(float(np.asarray(rec.e_out)[i]),
                                       0.75, atol=1e-12)


def test_perforated_and_polygon_trimming_matches_reference(reference):
    """Aperture-trimming semantics: rays aimed into a circular hole of a
    perforated plate and at/off a non-convex polygon plate — both engines
    agree ray-by-ray on hit vs miss, and hit points match to round-off
    (ref PerforatedRectPlateGM flat_surface.py:357,
    FlatSimplePolygonGM polygon.py:7)."""
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.flat_surface import PerforatedRectPlateGM
    from tracer.polygon import FlatSimplePolygonGM
    from tracer import optics_callables as opt
    from tracer.ray_bundle import RayBundle as RefBundle

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.engine import TracerEngine
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.scene import Assembly, AssembledObject, Surface

    # non-convex "L" polygon, clockwise per the reference's convention
    L = np.array([[0.0, 0.0, 1.0, 1.0, 2.0, 2.0],
                  [0.0, 2.0, 2.0, 1.0, 1.0, 0.0]])
    holes_c = np.array([[0.5, -0.6], [0.2, 0.3]])   # (2, n) centers
    holes_r = np.array([0.25, 0.2])

    cases = [
        (PerforatedRectPlateGM(3.0, 3.0, holes_c.T, holes_r),
         G.perforated_rect_plate(3.0, 3.0, holes_c.T, holes_r),
         np.array([[0.5, -0.6, 1.0],    # dead-center into hole 0 -> miss
                   [0.5, 0.1, 1.0],     # between the holes -> hit
                   [0.85, -0.6, 1.0],   # just outside hole 0 -> hit
                   [-0.65, 0.25, 1.0],  # just inside hole 1 -> miss
                   [1.6, 1.6, 1.0]])),  # plate corner region -> hit
        (FlatSimplePolygonGM(L),
         None,                          # filled below (triangle list)
         np.array([[0.5, 0.5, 1.0],     # inside the L -> hit
                   [1.5, 1.5, 1.0],     # in the notch -> miss
                   [0.5, 1.5, 1.0],     # upper arm -> hit
                   [1.5, 0.5, 1.0],     # lower arm -> hit
                   [2.5, 0.5, 1.0]])),  # outside -> miss
    ]
    # tracer_tpu polygon(): list of triangle Geometries -> one Surface
    tri_geoms = G.polygon(np.stack([L[0], L[1]], axis=1))
    cases[1] = (cases[1][0], tri_geoms, cases[1][2])

    for ref_gm, tpu_geom, pos in cases:
        n = len(pos)
        dirs = np.tile([0.0, 0.0, -1.0], (n, 1))
        surf = RefSurface(ref_gm, opt.Reflective(0.5))
        asm = RefAssembly(objects=[RefObject(surfs=[surf])])
        bundle = RefBundle(vertices=pos.T.copy(), directions=dirs.T.copy(),
                           energy=np.ones(n))
        eng = RefEngine(asm)
        v_ref, _ = eng.ray_tracer(bundle, 1, 1e-9)

        s2 = Surface(tpu_geom, M.reflective(0.5))
        eng2 = TracerEngine(Assembly([AssembledObject([s2])]))
        b = RayBundle.create(pos=pos, dir=dirs, energy=np.ones(n))
        res = eng2.ray_tracer(b, reps=1, key=jax.random.PRNGKey(0))
        rec = res.records[0]
        sid = np.asarray(rec.sid)
        hits = np.asarray(rec.hit)

        # ray-by-ray hit/miss agreement: the reference's outgoing bundle
        # holds only the hitters; ours marks misses with sid < 0
        hit_pts_ref = v_ref.T
        for i in range(n):
            expect_hit = bool(np.any(
                np.linalg.norm(hit_pts_ref[:, :2] - pos[i, :2], axis=1)
                < 1e-9))
            assert (sid[i] >= 0) == expect_hit, (i, pos[i], sid[i])
            if expect_hit:
                np.testing.assert_allclose(hits[i, :2], pos[i, :2],
                                           atol=1e-12)
                np.testing.assert_allclose(hits[i, 2], 0.0, atol=1e-12)
        assert (sid >= 0).sum() == hit_pts_ref.shape[0]


def test_buie_sunshape_distribution_matches_reference(reference):
    """Statistical source crossval on the headline sunshape: the angular
    distribution of Buie-sampled directions (solar disk + circumsolar
    aureole, CSR = 0.02) from both engines must agree bin-wise within
    3-sigma Poisson error, including the aureole tail (ref
    sources.py:330-465)."""
    import numpy.random as nprandom
    from tracer.sources import buie_sunshape as ref_buie
    from tracer_tpu.sources import buie_sunshape as tpu_buie

    n = 200_000
    CSR = 0.02
    d_main = np.array([0.0, 0.0, -1.0])

    nprandom.seed(7)
    b_ref = ref_buie(n, np.c_[[0.0, 0.0, 2.0]], d_main, 1.0, CSR,
                     flux=1000.0)
    cos_ref = -np.asarray(b_ref.get_directions())[2]
    th_ref = np.arccos(np.clip(cos_ref, -1.0, 1.0))

    b_tpu = tpu_buie(jax.random.PRNGKey(11), n, center=[0.0, 0.0, 2.0],
                     direction=d_main, radius=1.0, CSR=CSR, flux=1000.0)
    cos_tpu = -np.asarray(b_tpu.dir)[:, 2]
    th_tpu = np.arccos(np.clip(cos_tpu, -1.0, 1.0))

    # solar-disk half angle 4.65 mrad; histogram the disk + aureole
    th_d = 4.65e-3
    edges = np.concatenate([np.linspace(0.0, th_d, 12)[:-1],
                            np.geomspace(th_d, 9.0 * th_d, 8)])
    h_ref, _ = np.histogram(th_ref, bins=edges)
    h_tpu, _ = np.histogram(th_tpu, bins=edges)
    # every bin within 3 sigma of the two-run Poisson error
    sig = np.sqrt(h_ref + h_tpu + 1.0)
    bad = np.abs(h_ref - h_tpu) > 3.0 * sig
    assert not bad.any(), np.c_[edges[:-1][bad], h_ref[bad], h_tpu[bad]]
    # the aureole actually carries ~CSR of the rays beyond the disk edge
    tail_ref = (th_ref > th_d).mean()
    tail_tpu = (th_tpu > th_d).mean()
    assert 0.5 * CSR < tail_ref < 2.0 * CSR
    assert abs(tail_ref - tail_tpu) < 0.1 * CSR


@pytest.mark.parametrize("seed", [4, 9, 17])
def test_fuzzed_field_exact_against_reference(reference, seed):
    """Property-based EXACT cross-validation: a random field of tilted
    specular rect mirrors under a one-sided receiver, traced by both
    engines with the IDENTICAL 800-ray bundle (deterministic optics: no
    slope error, no sampling). Per-surface absorbed energies across 12
    bounces must agree to float64 round-off — any divergence in
    intersection roots, aperture trimming, winner selection, transform
    composition, backside handling, or energy bookkeeping shows up as a
    full ray-energy discrepancy."""
    import jax.numpy as jnp
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.flat_surface import RectPlateGM
    from tracer import optics_callables as oc
    from tracer.spatial_geometry import rotx as ref_rotx, roty as ref_roty
    from tracer.ray_bundle import RayBundle as RefBundle

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.engine import TracerEngine, TraceOptions
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene)

    rng = np.random.default_rng(seed)
    ref_surfs, tpu_surfs = [], []
    n_mirror = int(rng.integers(3, 7))
    for i in range(n_mirror):
        w, h = rng.uniform(0.8, 2.0), rng.uniform(0.8, 2.0)
        ab = rng.uniform(0.05, 0.3)
        r = rng.uniform(1.0, 3.0)
        th = rng.uniform(0, 2 * np.pi)
        loc = np.array([r * np.cos(th), r * np.sin(th),
                        rng.uniform(-0.3, 0.3)])
        rot = (ref_rotx(rng.uniform(-0.5, 0.5))
               @ ref_roty(rng.uniform(-0.5, 0.5)))[:3, :3]
        s = RefSurface(RectPlateGM(w, h), oc.ReflectiveAbsorber(ab))
        s.set_location(loc)
        s.set_rotation(rot)
        ref_surfs.append(s)
        tpu_surfs.append(Surface(G.rect_plate(w, h), M.reflective(ab),
                                 location=loc.tolist(), rotation=rot,
                                 name=f"m{i}"))
    rrot = ref_rotx(np.pi)[:3, :3]
    rs = RefSurface(RectPlateGM(7.0, 7.0),
                    oc.OneSidedReflectiveReceiver(1.0))
    rs.set_location(np.array([0.0, 0.0, 6.0]))
    rs.set_rotation(rrot)
    ref_surfs.append(rs)
    tpu_surfs.append(Surface(G.rect_plate(7.0, 7.0),
                             M.absorber(one_sided=True),
                             location=[0.0, 0.0, 6.0], rotation=rrot,
                             name="rec"))

    n_rays = 800
    rng2 = np.random.default_rng(seed + 1000)
    pos = np.c_[rng2.uniform(-3.5, 3.5, n_rays),
                rng2.uniform(-3.5, 3.5, n_rays),
                np.full(n_rays, 4.0)].T
    d = np.c_[rng2.normal(0, 0.05, n_rays), rng2.normal(0, 0.05, n_rays),
              -np.ones(n_rays)].T
    d /= np.linalg.norm(d, axis=0)
    e = rng2.uniform(0.5, 1.5, n_rays)

    reng = RefEngine(RefAssembly(objects=[RefObject(surfs=ref_surfs)]))
    reng.ray_tracer(RefBundle(vertices=pos.copy(), directions=d.copy(),
                              energy=e.copy()), 12, 1e-7)
    ref_abs = np.array([
        float(np.sum(s.get_optics_manager().get_all_hits()[0]))
        if len(s.get_optics_manager().get_all_hits()[0]) else 0.0
        for s in ref_surfs])

    table, meta = compile_scene(Assembly([AssembledObject(tpu_surfs)]),
                                dtype=jnp.float64)
    eng = TracerEngine(table, meta)
    b = RayBundle.create(pos=pos.T, dir=d.T, energy=e)
    res = eng.ray_tracer(b, reps=12, key=jax.random.PRNGKey(0),
                         opts=TraceOptions(max_bounces=12, record=False))
    ab_rows = np.asarray(res.accum.absorbed)
    tpu_abs = np.zeros(len(ref_abs))
    for row, logical in enumerate(np.asarray(meta.row_logical)):
        tpu_abs[logical] += ab_rows[row]

    np.testing.assert_allclose(tpu_abs, ref_abs, atol=1e-9)


# seeds chosen so the drawn kinds jointly cover all SEVEN geometry
# families: 6->{annular, frustum}, 50->{frustum, annular, cylinder,
# cone}, 77->{frustum, dish, hemisphere}, 301->{ellipsoid, cylinder}
@pytest.mark.parametrize("seed", [6, 50, 77, 301])
def test_fuzzed_quadric_field_exact_against_reference(reference, seed):
    """The curved twin of the exact fuzz test: random paraboloid /
    hemisphere / ellipsoid / annular-plate / finite-cone /
    conical-frustum / finite-cylinder mirrors
    (the quadric lowering's root-selection regimes — including the
    cone's apex normal special case, ref cone.py:50 — plus annular
    trimming) under the overhead receiver, identical
    600-ray bundle, 8 bounces — per-surface absorbed energies to float64
    round-off. Multi-bounce specular chains off CURVED surfaces amplify
    any root-choice or normal-sign divergence into a changed hit
    sequence, so exact agreement here pins the whole quadric table
    against the reference's per-class managers (ref paraboloid.py:71,
    sphere_surface.py:117, cylinder.py:59)."""
    import jax.numpy as jnp
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.object import AssembledObject as RefObject
    from tracer.surface import Surface as RefSurface
    from tracer.flat_surface import RectPlateGM, RoundPlateGM
    from tracer.paraboloid import ParabolicDishGM
    from tracer.sphere_surface import HemisphereGM
    from tracer.cylinder import FiniteCylinder
    from tracer.cone import ConicalFrustum, FiniteCone
    from tracer.ellipsoid import Ellipsoid
    from tracer import optics_callables as oc
    from tracer.spatial_geometry import rotx as ref_rotx, roty as ref_roty
    from tracer.ray_bundle import RayBundle as RefBundle

    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.engine import TracerEngine, TraceOptions
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene)

    rng = np.random.default_rng(seed)
    ref_surfs, tpu_surfs = [], []
    for i in range(int(rng.integers(3, 6))):
        r = rng.uniform(1.2, 3.0)
        th = rng.uniform(0, 2 * np.pi)
        loc = np.array([r * np.cos(th), r * np.sin(th),
                        rng.uniform(-0.2, 0.2)])
        rot = (ref_rotx(rng.uniform(-0.3, 0.3))
               @ ref_roty(rng.uniform(-0.3, 0.3)))[:3, :3]
        ab = rng.uniform(0.05, 0.3)
        kind = rng.integers(0, 7)
        if kind == 0:
            dd, ff = rng.uniform(0.8, 1.6), rng.uniform(3.0, 8.0)
            rg, tg = ParabolicDishGM(dd, ff), G.parabolic_dish(dd, ff)
        elif kind == 1:
            rr = rng.uniform(0.4, 0.8)
            rg, tg = HemisphereGM(rr), G.hemisphere(rr)
        elif kind == 2:
            ea, eb, ec = (rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7),
                          rng.uniform(0.3, 0.7))
            rg, tg = Ellipsoid(ea, eb, ec), G.ellipsoid(ea, eb, ec)
        elif kind == 3:
            ro = rng.uniform(0.5, 1.0)
            ri = rng.uniform(0.1, 0.4)
            rg, tg = (RoundPlateGM(Re=ro, Ri=ri),
                      G.round_plate(ro, ri))
        elif kind == 4:
            rr, hh = rng.uniform(0.4, 0.8), rng.uniform(0.6, 1.2)
            rg, tg = FiniteCone(rr, hh), G.finite_cone(rr, hh)
        elif kind == 5:
            z1 = rng.uniform(0.0, 0.2)
            z2 = z1 + rng.uniform(0.4, 0.8)
            r1, r2 = rng.uniform(0.2, 0.4), rng.uniform(0.5, 0.9)
            rg, tg = (ConicalFrustum(z1, r1, z2, r2),
                      G.conical_frustum(z1, r1, z2, r2))
        else:
            rr, hh = rng.uniform(0.3, 0.6), rng.uniform(0.6, 1.2)
            rg, tg = (FiniteCylinder(2 * rr, hh),
                      G.finite_cylinder(2 * rr, hh))
        s = RefSurface(rg, oc.ReflectiveAbsorber(ab))
        s.set_location(loc)
        s.set_rotation(rot)
        ref_surfs.append(s)
        tpu_surfs.append(Surface(tg, M.reflective(ab),
                                 location=loc.tolist(), rotation=rot,
                                 name=f"m{i}"))
    rrot = ref_rotx(np.pi)[:3, :3]
    rs = RefSurface(RectPlateGM(8.0, 8.0),
                    oc.OneSidedReflectiveReceiver(1.0))
    rs.set_location(np.array([0.0, 0.0, 6.0]))
    rs.set_rotation(rrot)
    ref_surfs.append(rs)
    tpu_surfs.append(Surface(G.rect_plate(8.0, 8.0),
                             M.absorber(one_sided=True),
                             location=[0.0, 0.0, 6.0], rotation=rrot,
                             name="rec"))

    n_rays = 600
    rng2 = np.random.default_rng(seed + 2000)
    pos = np.c_[rng2.uniform(-3.5, 3.5, n_rays),
                rng2.uniform(-3.5, 3.5, n_rays),
                np.full(n_rays, 4.0)].T
    d = np.c_[rng2.normal(0, 0.04, n_rays),
              rng2.normal(0, 0.04, n_rays), -np.ones(n_rays)].T
    d /= np.linalg.norm(d, axis=0)
    e = rng2.uniform(0.5, 1.5, n_rays)

    reng = RefEngine(RefAssembly(objects=[RefObject(surfs=ref_surfs)]))
    reng.ray_tracer(RefBundle(vertices=pos.copy(), directions=d.copy(),
                              energy=e.copy()), 8, 1e-7)
    ref_abs = np.array([
        float(np.sum(s.get_optics_manager().get_all_hits()[0]))
        if len(s.get_optics_manager().get_all_hits()[0]) else 0.0
        for s in ref_surfs])

    table, meta = compile_scene(Assembly([AssembledObject(tpu_surfs)]),
                                dtype=jnp.float64)
    eng = TracerEngine(table, meta)
    b = RayBundle.create(pos=pos.T, dir=d.T, energy=e)
    res = eng.ray_tracer(b, reps=8, key=jax.random.PRNGKey(0),
                         opts=TraceOptions(max_bounces=8, record=False))
    ab_rows = np.asarray(res.accum.absorbed)
    tpu_abs = np.zeros(len(ref_abs))
    for row, logical in enumerate(np.asarray(meta.row_logical)):
        tpu_abs[logical] += ab_rows[row]

    np.testing.assert_allclose(tpu_abs, ref_abs, atol=1e-9)


def test_spherical_lens_matches_reference(reference):
    """Deterministic biconvex-lens comparison (round-3 verdict item 7, ref
    models/spherical_lens.py:19 + tests/models/test_spherical_lens.py:18):
    a fan of meridional rays traced through BOTH engines with two-branch
    Fresnel SPLITTING pins (a) the lensmaker focal length (formula
    equality), (b) the measured focal power (axis crossings differ between
    engines by a single CONSTANT z-offset — the reference's documented H'
    placement bug, models/spherical_lens.py:92-96 — not by ray height),
    and (c) the transmitted Fresnel fraction to float64 round-off."""
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer.assembly import Assembly as RefAssembly
    from tracer.models.spherical_lens import SphericalLens as RefLens
    from tracer.ray_bundle import RayBundle as RefBundle
    from tracer import optics_callables as ropt

    heights = np.array([0.0005, 0.001, 0.002, 0.005, 0.01, -0.003, -0.008])
    K = len(heights)
    pos = np.zeros((3, K))
    pos[1] = heights
    pos[2] = 1.0
    dirs = np.tile(np.c_[[0.0, 0.0, -1.0]], (1, K))

    lens_r = RefLens(diameter=1.0, depth=0.1, R1=10.0, R2=-10.0,
                     refr_idx=1.5)
    f_ref = lens_r.focal_length()
    # force deterministic two-branch splitting in both engines
    for s in lens_r.get_surfaces():
        if isinstance(s.get_optics_manager(), ropt.RefractiveHomogenous):
            s._opt = ropt.RefractiveHomogenous(1.0, 1.5, single_ray=False)
    reng = RefEngine(RefAssembly(objects=[lens_r]))
    v_ref, d_ref = reng.ray_tracer(
        RefBundle(vertices=pos.copy(), directions=dirs.copy(),
                  energy=np.ones(K), ref_index=np.ones(K)), 2, 1e-9)
    # transmitted branch: exits the back face heading down
    sel = d_ref[2] < -0.5
    assert sel.sum() == K
    vt, dt = v_ref[:, sel], d_ref[:, sel]
    z_cross_ref = vt[2] - vt[1] * dt[2] / dt[1]
    order_ref = np.argsort(vt[1])

    from tracer_tpu import TracerEngine, materials as M
    from tracer_tpu.bundle import RayBundle
    from tracer_tpu.models.spherical_lens import SphericalLens
    from tracer_tpu.scene import Assembly

    lens_t = SphericalLens(1.0, 0.1, 10.0, -10.0, 1.5)
    f_tpu = lens_t.focal_length()
    np.testing.assert_allclose(f_tpu, f_ref, rtol=1e-12)
    np.testing.assert_allclose(f_ref, 2.0 / (0.2 - 0.05 / 150.0),
                               rtol=1e-12)
    for s in lens_t.get_surfaces():
        if s.optics.kind == M.K_REFRACTIVE:
            s.optics = M.refractive_homogenous(1.0, 1.5, single_ray=False)
    eng = TracerEngine(Assembly([lens_t]))
    b = RayBundle.create(pos=pos.T, dir=dirs.T, energy=np.ones(K),
                         ref_index=np.ones(K))
    res = eng.ray_tracer(b, reps=2, key=jax.random.PRNGKey(0))

    # transmitted mains at the back-face bounce
    rec = res.records[1]
    alive = np.asarray(rec.alive_in) & (np.asarray(rec.sid) >= 0)
    dout = np.asarray(rec.dir_out)
    m = alive & (dout[:, 2] < -0.5)
    assert m.sum() == K
    hit = np.asarray(rec.hit)[m]
    dT = dout[m]
    eT = np.asarray(rec.e_out)[m]
    z_cross_tpu = hit[:, 2] - hit[:, 1] * dT[:, 2] / dT[:, 1]
    order_tpu = np.argsort(hit[:, 1])

    # (b) focal power: axis crossings match up to ONE constant offset
    diff = z_cross_ref[order_ref] - z_cross_tpu[order_tpu]
    assert np.ptp(diff) < 1e-9, diff
    # our H'-at-origin placement puts the paraxial focus at exactly -f
    parax = np.abs(hit[:, 1]) < 2e-4 / f_tpu * 10  # smallest heights
    np.testing.assert_allclose(z_cross_tpu[parax], -f_tpu, atol=2e-4)

    # (c) Fresnel transmitted fraction: per-ray T1*T2 identical. The
    # reference carries no per-ray energy in its return; recompute from
    # its own optics: total transmitted energy == ours to round-off is
    # checked through a screen-absorbed comparison instead.
    from tracer.models.one_sided_mirror import one_sided_receiver
    from tracer.spatial_geometry import translate as rtranslate
    lens_r2 = RefLens(diameter=1.0, depth=0.1, R1=10.0, R2=-10.0,
                      refr_idx=1.5)
    for s in lens_r2.get_surfaces():
        if isinstance(s.get_optics_manager(), ropt.RefractiveHomogenous):
            s._opt = ropt.RefractiveHomogenous(1.0, 1.5, single_ray=False)
    screen_r = one_sided_receiver(5.0, 5.0)
    screen_r.set_transform(rtranslate(0, 0, -f_ref))
    reng2 = RefEngine(RefAssembly(objects=[lens_r2, screen_r]))
    reng2.ray_tracer(RefBundle(vertices=pos.copy(), directions=dirs.copy(),
                               energy=np.ones(K), ref_index=np.ones(K)),
                     3, 1e-9)
    e_screen_ref = float(np.sum(
        screen_r.get_surfaces()[0].get_optics_manager().get_all_hits()[0]))

    # ours: transmitted energy from the bounce-2 record directly
    e_screen_tpu = float(eT.sum())
    np.testing.assert_allclose(e_screen_tpu, e_screen_ref, rtol=1e-11)
    # sanity: ~92% of a normal-incidence fan clears two n=1.5 interfaces
    assert 0.90 < e_screen_tpu / K < 0.94


def test_volumetric_absorbant_matches_reference_engine(reference):
    """Volumetric Beer-Lambert cross-validation: two facing
    LambertianAbsorbant plates in an absorbing medium (ref Absorbant
    optics_callables.py:861 mixed into Lambertian :891 — every segment
    ending on a plate attenuates over its path length) traced through
    BOTH engines. The reference accountant books attenuation + surface
    absorption together per interaction, so the tracer_tpu side
    reconstructs the same quantity from its slot-aligned per-bounce
    records: (previous e_out - this e_out) for every interaction on the
    plate, with the engine volumetrics carrying the per-ray att_coeff."""
    import jax.numpy as jnp
    import tracer.optics_callables as oc
    from tracer.flat_surface import RectPlateGM
    from tracer.surface import Surface as RSurface
    from tracer.object import AssembledObject as RObject
    from tracer.assembly import Assembly as RAssembly
    from tracer.tracer_engine import TracerEngine as RefEngine
    from tracer import spatial_geometry as rsp
    from tracer.sources import oblique_solar_rect_bundle as ref_source

    from tracer_tpu import geometry as G, materials as M, spatial as sp
    from tracer_tpu.engine import TracerEngine, TraceOptions
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene)
    from tracer_tpu.sources import oblique_solar_rect_bundle

    alpha, k, n = 0.3, 0.4, 20_000
    d = np.r_[0.15, 0.0, -np.sqrt(1.0 - 0.15 ** 2)]

    # ---- reference engine
    np.random.seed(42)
    f_opt = oc.LambertianAbsorbantReceiver(absorptivity=alpha,
                                           attenuation_coefficient=[k])
    c_opt = oc.LambertianAbsorbantReceiver(absorptivity=alpha,
                                           attenuation_coefficient=[k])
    r_floor = RSurface(RectPlateGM(4.0, 4.0), f_opt)
    r_ceil = RSurface(RectPlateGM(4.0, 4.0), c_opt,
                      location=np.r_[0.0, 0.0, 1.0],
                      rotation=rsp.rotx(np.pi)[:3, :3])
    r_asm = RAssembly(objects=[RObject(surfs=[r_floor, r_ceil])])
    sun = ref_source(n, np.vstack([[0.0], [0.0], [0.999]]),
                     np.r_[0.0, 0.0, -1.0], d, 1.0, 1.0, 4.65e-3, 1000.0)
    se_ref = float(sun.get_energy().sum())
    RefEngine(r_asm).ray_tracer(sun, 30, 1e-6)
    ref_floor = float(f_opt.get_all_hits()[0].sum()) / se_ref
    ref_ceil = float(c_opt.get_all_hits()[0].sum()) / se_ref

    # ---- tracer_tpu (CPU float64, host-stepped with records)
    floor = Surface(G.rect_plate(4.0, 4.0), M.lambertian(alpha),
                    name="floor")
    ceil = Surface(G.rect_plate(4.0, 4.0), M.lambertian(alpha),
                   name="ceil", location=[0.0, 0.0, 1.0],
                   rotation=sp.rotx(np.pi)[:3, :3])
    table, meta = compile_scene(
        Assembly([AssembledObject([floor, ceil])]), dtype=jnp.float64,
        extra_features=("volumetric",))
    b = oblique_solar_rect_bundle(
        jax.random.PRNGKey(0), n, [0.0, 0.0, 0.999], [0.0, 0.0, -1.0],
        list(d), 1.0, 1.0, 4.65e-3, 1000.0)
    b = b.replace(att_coeff=jnp.full((n,), k, b.pos.dtype))
    se = float(np.asarray(b.energy).sum())
    np.testing.assert_allclose(se, se_ref, rtol=1e-12)  # same cos-flux
    eng = TracerEngine(table, meta)
    res = eng.ray_tracer(b, reps=30, min_energy=1e-6,
                         key=jax.random.PRNGKey(1),
                         opts=TraceOptions(max_bounces=30))

    def rows_of(name):
        return np.nonzero(np.asarray(meta.row_logical)
                          == meta.index_of(name))[0]

    prev = np.asarray(b.energy).copy()
    dep = {"floor": 0.0, "ceil": 0.0}
    for rec in res.records:
        sid = np.asarray(rec.sid)
        ok = np.asarray(rec.alive_in) & (sid >= 0)
        e_out = np.asarray(rec.e_out)
        for name in dep:
            m = ok & np.isin(sid, rows_of(name))
            dep[name] += float((prev[m] - e_out[m]).sum())
        prev = np.where(ok, e_out, prev)

    # 3-sigma-ish MC band for two independent 20k-ray estimates of
    # fractions ~0.25-0.6 (binomial bound: sqrt(2 f(1-f)/n) ~ 0.005)
    for name, ref_frac in (("floor", ref_floor), ("ceil", ref_ceil)):
        sigma = np.sqrt(2.0 * ref_frac * (1.0 - ref_frac) / n)
        assert abs(dep[name] / se - ref_frac) < 4.0 * sigma, \
            (name, dep[name] / se, ref_frac)
    assert ref_floor > 0.5     # the scenario is what we think it is
    assert ref_ceil > 0.15
