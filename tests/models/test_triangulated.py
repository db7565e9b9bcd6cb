"""Triangulated surface + STL pipeline tests (cf. ref
tests/models/test_face_set.py)."""
import os

import jax
import numpy as np

from tracer_tpu import TracerEngine
from tracer_tpu import materials as M
from tracer_tpu.bundle import RayBundle
from tracer_tpu.models.triangulated_surface import TriangulatedSurface
from tracer_tpu.scene import Assembly
from tracer_tpu.stl_utils import (cylinder_verts_faces, load_stl, make_stl,
                                  load_stl_into_tracer,
                                  rectangle_verts_faces)


def test_pyramid_intercepts_rays():
    """A 4-face pyramid mesh absorbs rays aimed at its faces (the ref
    test_face_set scenario)."""
    apex = [0.0, 0.0, 1.0]
    base = [[1, 1, 0], [-1, 1, 0], [-1, -1, 0], [1, -1, 0]]
    verts = np.array([apex] + base, dtype=float)
    faces = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 1]])
    obj = TriangulatedSurface(verts, faces, M.receiver(M.reflective(1.0)))
    eng = TracerEngine(Assembly(objects=[obj]))
    # rays straight down over the footprint hit a face; outside misses
    pos = np.array([[0.3, 0.0, 3.0], [0.0, -0.4, 3.0], [2.0, 2.0, 3.0]])
    dirs = np.tile([0.0, 0.0, -1.0], (3, 1))
    res = eng.ray_tracer(RayBundle.create(pos=pos, dir=dirs), reps=1,
                         key=jax.random.PRNGKey(0))
    sid = np.asarray(res.records[0].sid)
    assert (sid[:2] >= 0).all() and sid[2] == -1
    # one logical surface despite 4 rows
    assert res.absorbed_by_logical().shape == (1,)
    np.testing.assert_allclose(res.absorbed_by_logical()[0], 2.0, rtol=1e-12)


def test_stl_roundtrip(tmp_path):
    verts, faces = cylinder_verts_faces(1.0, 2.0, angbins=12, lbins=3)
    path = os.path.join(tmp_path, "cyl.stl")
    make_stl(path, verts, faces)
    v2, f2 = load_stl(path)
    assert len(f2) == len(faces)
    # every original vertex appears in the reloaded set
    tri_orig = np.sort(verts[faces].reshape(-1, 3), axis=0)
    tri_new = np.sort(v2[f2].reshape(-1, 3), axis=0)
    np.testing.assert_allclose(tri_orig, tri_new, atol=1e-6)


def test_stl_traced(tmp_path):
    """Rays hit a meshed rectangle loaded from STL."""
    verts, faces = rectangle_verts_faces(2.0, 2.0, nx=3, ny=3)
    path = os.path.join(tmp_path, "plate.stl")
    make_stl(path, verts, faces)
    obj = load_stl_into_tracer(path, M.reflective(1.0))
    eng = TracerEngine(Assembly(objects=[obj]))
    n = 100
    key = jax.random.PRNGKey(1)
    xy = jax.random.uniform(key, (n, 2), minval=-0.9, maxval=0.9)
    pos = np.concatenate([np.asarray(xy), np.ones((n, 1))], axis=1)
    res = eng.ray_tracer(RayBundle.create(
        pos=pos, dir=np.tile([0, 0, -1.0], (n, 1))), reps=1,
        key=jax.random.PRNGKey(2))
    assert (np.asarray(res.records[0].sid) >= 0).all()
    np.testing.assert_allclose(res.absorbed_by_logical().sum(), n, rtol=1e-9)
