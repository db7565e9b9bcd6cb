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
