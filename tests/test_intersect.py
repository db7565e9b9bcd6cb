"""Exact-geometry intersection tests (tier 1 of the reference's test plan:
hand-placed rays with analytically known hits, cf. ref
tests/test_flat_geometry_manager.py, test_cylinder.py, test_paraboloid_gm.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tracer_tpu import geometry as G
from tracer_tpu import materials as M
from tracer_tpu.scene import Assembly, AssembledObject, Surface, compile_scene
from tracer_tpu.kernels.intersect import nearest_hit
from tracer_tpu import spatial


def scene_of(geom, transform=None):
    surf = Surface(geom, M.perfect_mirror())
    obj = AssembledObject(surfs=[surf])
    if transform is not None:
        obj.set_transform(transform)
    asm = Assembly(objects=[obj])
    table, meta = compile_scene(asm, dtype=jnp.float64)
    return table


def hit_ts(table, pos, dirs):
    t, sid = nearest_hit(table, jnp.asarray(pos, dtype=jnp.float64),
                         jnp.asarray(dirs, dtype=jnp.float64))
    return np.asarray(t), np.asarray(sid)


def test_flat_plate_straight_down():
    table = scene_of(G.rect_plate(2.0, 2.0))
    pos = np.array([[0.0, 0.0, 1.0], [0.5, 0.5, 2.0],
                    [1.5, 0.0, 1.0],      # outside the aperture
                    [0.0, 0.0, 1.0]])
    dirs = np.array([[0.0, 0.0, -1.0]] * 3 + [[0.0, 0.0, 1.0]])  # last: away
    t, sid = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t[:2], [1.0, 2.0], atol=1e-12)
    assert np.isinf(t[2]) and np.isinf(t[3])
    assert sid[0] == 0 and sid[2] == -1


def test_flat_plate_oblique_and_transformed():
    # plate rotated 45 deg about x, ray along -z from above
    tr = spatial.rotx(np.pi / 4)
    table = scene_of(G.flat(), transform=tr)
    pos = np.array([[0.0, 0.0, 1.0]])
    dirs = np.array([[0.0, 0.0, -1.0]])
    t, sid = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t, [1.0], atol=1e-12)


def test_sphere_two_roots():
    table = scene_of(G.sphere(1.0))
    # from outside: nearest root; from inside: the far root
    pos = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 0.0]])
    dirs = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, sid = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t, [1.0, 1.0], atol=1e-12)


def test_hemisphere_selects_lower_half():
    table = scene_of(G.hemisphere(1.0))
    # ray down the z axis from above: must skip z=+1 hit, take z=-1
    pos = np.array([[0.0, 0.0, 2.0]])
    dirs = np.array([[0.0, 0.0, -1.0]])
    t, _ = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t, [3.0], atol=1e-12)


def test_paraboloid_dish():
    # z = (x^2+y^2)/(4f), f = 1 -> at x=1, z = 0.25
    table = scene_of(G.parabolic_dish(diameter=4.0, focal_length=1.0))
    pos = np.array([[1.0, 0.0, 1.0],
                    [3.0, 0.0, 1.0]])   # outside r=2 -> z above h=1
    dirs = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, sid = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t[0], 0.75, atol=1e-12)
    assert np.isinf(t[1])


def test_cylinder_side_hit_and_height_trim():
    table = scene_of(G.finite_cylinder(diameter=2.0, height=2.0))
    pos = np.array([[2.0, 0.0, 0.0],
                    [2.0, 0.0, 5.0]])   # above the cylinder
    dirs = np.array([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    t, _ = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t[0], 1.0, atol=1e-12)
    assert np.isinf(t[1])


def test_cone_frustum():
    # frustum from (z=0, r=1) to (z=1, r=2)
    table = scene_of(G.conical_frustum(0.0, 1.0, 1.0, 2.0))
    pos = np.array([[5.0, 0.0, 0.5]])
    dirs = np.array([[-1.0, 0.0, 0.0]])
    t, _ = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t, [5.0 - 1.5], atol=1e-12)


def test_ellipsoid():
    table = scene_of(G.ellipsoid(2.0, 1.0, 1.0))
    pos = np.array([[5.0, 0.0, 0.0]])
    dirs = np.array([[-1.0, 0.0, 0.0]])
    t, _ = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t, [3.0], atol=1e-12)


def test_round_plate_annulus():
    table = scene_of(G.round_plate(2.0, 1.0))
    pos = np.array([[1.5, 0.0, 1.0], [0.5, 0.0, 1.0], [2.5, 0.0, 1.0]])
    dirs = np.tile([0.0, 0.0, -1.0], (3, 1))
    t, _ = hit_ts(table, pos, dirs)
    assert np.isfinite(t[0]) and np.isinf(t[1]) and np.isinf(t[2])


def test_triangle_face():
    tri = G.triangle([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    table = scene_of(tri)
    pos = np.array([[0.2, 0.2, 1.0], [0.8, 0.8, 1.0]])
    dirs = np.tile([0.0, 0.0, -1.0], (2, 1))
    t, _ = hit_ts(table, pos, dirs)
    assert np.isfinite(t[0]) and np.isinf(t[1])


def test_hexagonal_dish_aperture():
    table = scene_of(G.hexagonal_parabolic_dish(diameter=4.0, focal_length=10.0))
    # hexagon circumradius 2, two sides parallel to y: point x=1.9,y=0 is
    # inside (sqrt(3)*2/2 = 1.732... NO: |x| <= 1.732): x=1.9 outside.
    pos = np.array([[1.0, 0.0, 5.0], [1.9, 0.0, 5.0], [0.0, 1.9, 5.0]])
    dirs = np.tile([0.0, 0.0, -1.0], (3, 1))
    t, _ = hit_ts(table, pos, dirs)
    assert np.isfinite(t[0])
    assert np.isinf(t[1])       # beyond sqrt(3)R/2
    assert np.isfinite(t[2])    # |y| = 1.9 <= R - tan(30)*0 = 2


def test_multi_surface_nearest():
    # two parallel plates, the nearer one must win
    s1 = Surface(G.rect_plate(4.0, 4.0), M.perfect_mirror())
    s2 = Surface(G.rect_plate(4.0, 4.0), M.perfect_mirror())
    o1 = AssembledObject(surfs=[s1])
    o2 = AssembledObject(surfs=[s2])
    o2.set_transform(spatial.translate(z=-1.0))
    table, _ = compile_scene(Assembly(objects=[o1, o2]), dtype=jnp.float64)
    pos = np.array([[0.0, 0.0, 2.0]])
    dirs = np.array([[0.0, 0.0, -1.0]])
    t, sid = hit_ts(table, pos, dirs)
    np.testing.assert_allclose(t, [2.0], atol=1e-12)
    assert sid[0] == 0
