"""Kd-tree acceleration tests: the relevancy mask never excludes the true
nearest hit (the reference's de-facto accel correctness criterion,
examples/accel_tree_example.py:55-101: accel on/off give identical absorbed
energy)."""
import jax
import numpy as np

from tracer_tpu import TracerEngine
from tracer_tpu import geometry as G
from tracer_tpu import materials as M
from tracer_tpu import spatial as sp
from tracer_tpu.accel import KdTree
from tracer_tpu.bundle import RayBundle
from tracer_tpu.kernels.intersect import nearest_hit
from tracer_tpu.scene import Assembly, AssembledObject, Surface


def _plate_field(n_side=5, spacing=3.0):
    objs = []
    for i in range(n_side):
        for j in range(n_side):
            o = AssembledObject(surfs=[Surface(G.rect_plate(2.0, 2.0),
                                               M.reflective(1.0))])
            o.set_transform(sp.translate(x=(i - n_side // 2) * spacing,
                                         y=(j - n_side // 2) * spacing))
            objs.append(o)
    return Assembly(objects=objs)


def test_kdtree_mask_contains_true_hits():
    asm = _plate_field()
    eng = TracerEngine(asm)
    tree = KdTree(eng.meta)
    assert len(tree.nodes) > 1   # it actually split

    n = 2000
    key = jax.random.PRNGKey(0)
    xy = np.asarray(jax.random.uniform(key, (n, 2), minval=-8.0, maxval=8.0))
    pos = np.concatenate([xy, np.full((n, 1), 5.0)], axis=1)
    dirs = np.tile([0.05, -0.03, -1.0], (n, 1))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    t, sid = nearest_hit(eng.scene, pos, dirs)
    sid = np.asarray(sid)
    mask = tree.traversal(pos, dirs)
    hit = sid >= 0
    # every true hit must be in the relevancy mask
    assert mask[sid[hit], np.nonzero(hit)[0]].all()
    # and the mask prunes most of the scene
    assert mask.mean() < 0.35


def test_kdtree_candidate_lists():
    asm = _plate_field(n_side=3)
    eng = TracerEngine(asm)
    tree = KdTree(eng.meta)
    pos = np.array([[0.0, 0.0, 5.0]])
    dirs = np.array([[0.0, 0.0, -1.0]])
    cands = tree.surfaces_for_rays(pos, dirs)[0]
    # the central plate must be among the candidates
    t, sid = nearest_hit(eng.scene, pos, dirs)
    assert int(sid[0]) in cands
    assert len(cands) < 9


def _mixed_scene():
    """Mirrors + dish + receiver: multiple aperture-signature groups, so
    rows ARE reordered by the scene compiler — regression cover for the
    row_aabbs frame/geometry pairing."""
    from tracer_tpu.models.tau_minidish import MiniDish
    asm = MiniDish(diameter=5.0, focal_length=6.25, dish_opt_eff=0.9,
                   receiver_pos=6.95, receiver_side=0.4,
                   homogenizer_depth=0.7, homog_opt_eff=0.9)
    asm.set_transform(sp.rotx(-np.pi / 4))
    return asm


def _sun(key, n):
    from tracer_tpu.sources import disk_bundle
    x = -1.0 / np.sqrt(2.0)
    return disk_bundle(key, n, center=[0.0, 7.0, 7.0], direction=[0.0, x, x],
                       radius=3.0, ang_range=0.005, flux=1000.0)


def test_accel_on_off_identical_trace():
    """The reference's A/B/A harness (examples/accel_tree_example.py:55-101)
    as a hard equality: tracing with accel='lightweight' must give EXACTLY
    the same per-surface absorbed energy as brute force — the RNG stream is
    intersection-independent and sound candidate sets give identical hits."""
    asm = _mixed_scene()
    eng = TracerEngine(asm)
    key = jax.random.PRNGKey(5)
    bundle = _sun(key, 4096)

    r_off = eng.ray_tracer(bundle, reps=20, key=jax.random.PRNGKey(9))
    a_off = r_off.absorbed_by_logical()
    r_on = eng.ray_tracer(bundle, reps=20, key=jax.random.PRNGKey(9),
                          accel="lightweight")
    a_on = r_on.absorbed_by_logical()
    r_off2 = eng.ray_tracer(bundle, reps=20, key=jax.random.PRNGKey(9))
    a_off2 = r_off2.absorbed_by_logical()

    np.testing.assert_allclose(a_off, a_off2, rtol=0.0)   # A == A
    np.testing.assert_allclose(a_on, a_off, rtol=1e-9)    # B == A
    bal = r_on.energy_balance()
    assert abs(bal["closure"]) < 1e-6 * bal["source"]


def test_accel_prunes_and_logs(caplog):
    """The Kd path must actually shrink the per-ray candidate width, and
    the per-bounce observability hooks must emit (VERDICT round 1 item 9:
    parity with ref tracer_engine.py:282-294 trace-time logging)."""
    import logging
    asm = _plate_field(n_side=7)   # 49 plates
    eng = TracerEngine(asm)
    bundle = _sun_down(512)
    with caplog.at_level(logging.INFO, logger="tracer_tpu"):
        eng.ray_tracer(bundle, reps=4, accel="lightweight")
    msgs = [r.message for r in caplog.records]
    assert any("kdtree build" in m for m in msgs)
    assert any("trace time" in m and "alive" in m for m in msgs)
    import re
    widths = [int(m.group(1)) for m in
              (re.search(r"(\d+) candidates/ray", s) for s in msgs) if m]
    assert widths and max(widths) <= 16   # 49 surfaces -> <= 16 candidates


def _sun_down(n):
    from tracer_tpu.sources import disk_bundle
    return disk_bundle(jax.random.PRNGKey(1), n, center=[0.0, 0.0, 6.0],
                       direction=[0.0, 0.0, -1.0], radius=8.0,
                       ang_range=0.01, flux=1000.0)


def test_unbounded_kinds_always_relevant():
    """Rows with no finite extent (infinite plane/paraboloid) cannot be
    bounded: the KdTree marks them always relevant instead of building a
    bogus token box that would silently cull real hits (ref
    accel_tree.py:59-73 boundary-less objects)."""
    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.accel import KdTree
    from tracer_tpu.engine import TracerEngine
    from tracer_tpu.scene import Assembly, AssembledObject, Surface

    plane = Surface(G.flat(), M.absorber(), location=[50.0, 0.0, 0.0])
    plate = Surface(G.rect_plate(1.0, 1.0), M.absorber(),
                    location=[0.0, 0.0, 2.0])
    eng = TracerEngine(Assembly(objects=[AssembledObject(
        surfs=[plane, plate])]))
    tree = KdTree(eng.meta)
    assert len(tree.always_relevant) == 1
    # a ray far outside any token box still gets the plane as relevant
    mask = tree.traversal(np.array([[200.0, 0.0, 1.0]]),
                          np.array([[0.0, 0.0, -1.0]]))
    assert mask[tree.always_relevant[0], 0]


def test_intersect_bounds_on_slab_plane_parallel_ray():
    """A ray origin exactly on an AABB face with the matching direction
    component zero used to produce 0*inf = NaN and cull the ray."""
    from tracer_tpu.accel import KdTree

    bounds = np.array([[0.0, -1.0, -1.0], [2.0, 1.0, 1.0]])
    pos = np.array([[0.0, 0.0, 5.0]])     # x exactly on the lower face
    dirs = np.array([[0.0, 0.0, -1.0]])   # dx == 0
    assert KdTree.intersect_bounds(bounds, pos, dirs)[0]
