"""Tests for IO, viz, and the compat name layer."""
import os

import jax
import numpy as np

from tracer_tpu import compat
from tracer_tpu import io_utils as io
from tracer_tpu import materials as M


def test_hist_csv_roundtrip(tmp_path):
    hist = np.arange(12, dtype=float).reshape(3, 4)
    bx = np.linspace(0, 1, 4)
    by = np.linspace(0, 2, 5)
    p = os.path.join(tmp_path, "h.csv")
    io.save_hist_data_csv(hist, (bx, by), "flux", ("x", "y"), "test run", p)
    bins, data, bl, dl, info = io.load_hist_data_csv(p)
    np.testing.assert_allclose(bins[0], bx)
    np.testing.assert_allclose(bins[1], by)
    np.testing.assert_allclose(data, hist)
    assert dl == "flux" and info == "test run"


def test_binary_source_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(50, 3))
    d = rng.normal(size=(50, 3))
    e = rng.uniform(1, 2, size=50)
    p = os.path.join(tmp_path, "src0")
    io.binarize_source(p, v.T, d.T, e)
    v2, d2, e2 = io.load_source(p)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_allclose(d2, d)
    np.testing.assert_allclose(e2, e)
    b = io.source_to_bundle(p)
    assert b.num_rays == 50
    io.rescale_source_energy([p], 100.0)
    assert abs(io.load_source(p)[2].sum() - 100.0) < 1e-9
    io.push_back_rays(p, 2.0)
    v3, d3, _ = io.load_source(p)
    np.testing.assert_allclose(v3, v - 2.0 * d, rtol=1e-12)


def test_soltrace_import(tmp_path):
    # synthetic SolTrace CSV: x,y,z,dx,dy,dz,element,stage
    rows = np.zeros((40, 8))
    rows[:, :3] = np.random.default_rng(1).normal(size=(40, 3))
    rows[:, 5] = -1.0
    rows[:, 6] = -1
    rows[:, 7] = 2
    f = os.path.join(tmp_path, "st.csv")
    np.savetxt(f, rows, delimiter=",", header="soltrace")
    out = io.import_soltrace([f], total_power=1000.0, rays_per_source=20,
                             target_dir=os.path.join(tmp_path, "srcs"))
    assert len(out) == 2
    v, d, e = io.load_sources(out)
    assert len(v) == 40 and abs(e.sum() - 2000.0) < 1e-6


def test_compat_names():
    spec = compat.ReflectiveReceiver(absorptivity=0.9)
    assert spec.kind == M.K_REFLECT
    assert spec.params[0] == 0.9
    assert set(spec.record) == {"location", "absorption"}
    spec = compat.OneSidedRealReflectiveDetector(0.1, 1e-3, True)
    assert spec.flags & M.F_ONE_SIDED and spec.flags & M.F_BIVAR
    assert "direction" in spec.record
    spec = compat.LambertianReceiver(absorptivity=1.0)
    assert spec.kind == M.K_LAMBERTIAN
    assert compat.perfect_mirror.kind == M.K_REFLECT


def test_renderer_saves_png(tmp_path):
    from tracer_tpu import TracerEngine, spatial
    from tracer_tpu.models.tau_minidish import MiniDish
    from tracer_tpu.sources import solar_disk_bundle
    from tracer_tpu.viz.render import Renderer, scene_tree
    import math

    asm = MiniDish(5.0, 6.25, 0.9, 6.95, 0.4, 0.7, 0.9)
    asm.set_transform(spatial.rotx(-np.pi / 4))
    eng = TracerEngine(asm)
    x = -1.0 / math.sqrt(2.0)
    sun = solar_disk_bundle(jax.random.PRNGKey(0), 500,
                            center=[0, 7.0, 7.0], direction=[0, x, x],
                            radius=3.0, ang_range=0.005, flux=1000.0)
    res = eng.ray_tracer(sun, reps=5, key=jax.random.PRNGKey(1))
    r = Renderer(eng)
    r.show_geom()
    r.show_rays(res, max_rays=50)
    out = os.path.join(tmp_path, "scene.png")
    r.save(out)
    assert os.path.getsize(out) > 10_000
    tree = scene_tree(asm)
    assert "Surface 'dish'" in tree and "Assembly" in tree


def test_show_geom_draws_each_row_at_its_own_frame():
    """Regression: compile_scene sorts table rows by (aperture signature,
    quadric class), so a flat receiver sorts BEFORE a parabolic dish even
    when the dish's Surface was added first. show_geom must pair each
    mesh with the frame of ITS row (via row_logical/row_geoms), not walk
    meta.surfaces order positionally — that drew the dish at the
    receiver's transform."""
    import jax.numpy as jnp
    from tracer_tpu import geometry as G2, materials as M2
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene)
    from tracer_tpu.viz.render import Renderer

    dish = Surface(G2.parabolic_dish(diameter=2.0, focal_length=1.5),
                   M2.reflective(0.1), name="dish")
    rec = Surface(G2.round_plate(0.2), M2.absorber(),
                  location=[0.0, 0.0, 1.5], name="rec")
    table, meta = compile_scene(
        Assembly([AssembledObject([dish, rec])]), dtype=jnp.float64)
    # precondition: the sort actually reorders (flat rec row first)
    assert meta.names[int(meta.row_logical[0])] == "rec"

    r = Renderer((table, meta))
    drawn = []
    real_plot = r.ax.plot_surface
    r.ax.plot_surface = lambda X, Y, Z, **kw: drawn.append(
        (np.asarray(X), np.asarray(Y), np.asarray(Z)))
    r.show_geom()
    assert len(drawn) == 2
    # the small mesh (radius ~0.2) must sit at z = 1.5, the wide dish at
    # z ~ 0: with the positional pairing bug the transforms swap
    for X, Y, Z in drawn:
        rmax = float(np.hypot(X, Y).max())
        if rmax < 0.5:
            np.testing.assert_allclose(Z, 1.5, atol=1e-9)
        else:
            assert rmax > 0.9
            assert float(np.abs(Z).max()) < 0.5, "dish drawn at rec frame"
    r.ax.plot_surface = real_plot
