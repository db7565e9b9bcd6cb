"""Deterministic model tests mirroring the reference's tests/models suite
(test_homogenizer.py, test_one_sided_mirror.py, test_minidish.py): exact
hit points, routing, and energy bookkeeping for hand-placed rays."""
import numpy as np
import jax

from tracer_tpu import RayBundle, TracerEngine, spatial
from tracer_tpu.scene import Assembly


def _trace(asm, pos, dirs, energy, reps=1, min_energy=0.05):
    eng = TracerEngine(asm)
    bund = RayBundle.create(np.asarray(pos, float), np.asarray(dirs, float),
                            energy=np.asarray(energy, float))
    res = eng.ray_tracer(bund, reps=reps, min_energy=min_energy,
                        key=jax.random.PRNGKey(0))
    return res


def test_homogenizer_first_hits():
    """Ref tests/models/test_homogenizer.py: four rays entering a 5x3x10
    kaleidoscope from above, one toward each wall — exact specular hit
    points and reflected directions."""
    from tracer_tpu.models.homogenizer import rect_homogenizer
    hmg = rect_homogenizer(5.0, 3.0, 10.0, 0.9)
    s = 1.0 / np.sqrt(2.0)
    pos = np.zeros((4, 3))
    pos[:, 2] = 11.0
    dirs = np.array([[s, 0, -s], [-s, 0, -s], [0, s, -s], [0, -s, -s]])
    res = _trace(hmg, pos, dirs, 4.0 * np.ones(4))

    rec = res.records[0]
    hits = np.asarray(rec.hit)
    outd = np.asarray(rec.dir_out)
    np.testing.assert_allclose(
        hits, [[2.5, 0, 8.5], [-2.5, 0, 8.5], [0, 1.5, 9.5], [0, -1.5, 9.5]],
        atol=1e-6)
    np.testing.assert_allclose(
        outd, [[-s, 0, -s], [s, 0, -s], [0, -s, -s], [0, s, -s]], atol=1e-6)
    # 10% absorbed at the first wall
    np.testing.assert_allclose(np.asarray(rec.e_out), 3.6 * np.ones(4),
                               rtol=1e-6)


def test_one_sided_mirror_front_back():
    """Ref tests/models/test_one_sided_mirror.py: rays from above reflect
    with x(1-a); rays from below are killed (backside), rays outside the
    plate miss."""
    from tracer_tpu.models.one_sided_mirror import rect_one_sided_mirror
    mirror = rect_one_sided_mirror(1.5, 1.5, 0.9)
    pos = np.zeros((8, 3))
    pos[:, 0] = np.tile([0.0, 0.5, 2.0, -2.0], 2)
    pos[:, 2] = np.repeat([1.0, -1.0], 4)
    dirs = np.zeros((8, 3))
    dirs[:, 2] = np.repeat([-1.0, 1.0], 4)
    res = _trace(Assembly(objects=[mirror]), pos, dirs,
                 1000.0 * np.ones(8))

    rec = res.records[0]
    e_out = np.asarray(rec.e_out)
    sid = np.asarray(rec.sid)
    # front-side hits inside the plate survive with 10%
    np.testing.assert_allclose(e_out[:2], [100.0, 100.0], rtol=1e-6)
    # outside the plate: no hit
    assert (sid[2:4] == -1).all()
    # backside hits are absorbed dead (one-sided)
    assert (sid[4:6] >= 0).all()
    np.testing.assert_allclose(e_out[4:6], 0.0, atol=1e-9)


def test_one_sided_mirror_rotated():
    """Rotated one-sided plate: hit points follow the transform
    (ref test_one_sided_mirror.py test_rotated)."""
    from tracer_tpu.models.one_sided_mirror import rect_one_sided_mirror
    mirror = rect_one_sided_mirror(1.5, 1.5, 0.9)
    mirror.set_transform(spatial.roty(np.pi / 4.0))
    pos = np.zeros((2, 3))
    pos[:, 0] = [0.0, 0.5]
    pos[:, 2] = 1.0
    dirs = np.zeros((2, 3))
    dirs[:, 2] = -1.0
    res = _trace(Assembly(objects=[mirror]), pos, dirs, [1000.0, 1000.0])
    rec = res.records[0]
    np.testing.assert_allclose(np.asarray(rec.hit),
                               [[0.0, 0.0, 0.0], [0.5, 0.0, -0.5]],
                               atol=1e-6)
    # 45-degree plate (normal (s, 0, s)) turns -z rays into +x rays
    np.testing.assert_allclose(np.asarray(rec.dir_out),
                               [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]],
                               atol=1e-6)


def test_minidish_deterministic_rays():
    """Ref tests/models/test_minidish.py test_upright: five paraxial rays
    into a (5, 5) minidish; the four that hit the dish reach the receiver
    plane with energy x0.9 (dish) and possibly x0.9 more (homogenizer),
    landing on the y=0 line."""
    from tracer_tpu.models.tau_minidish import MiniDish
    md = MiniDish(5.0, 5.0, 0.9, 5.7, 0.4, 0.7, 0.9)
    pos = np.zeros((5, 3))
    pos[:, 0] = np.linspace(-2.0, 2.0, 5)
    pos[:, 2] = 6.0
    dirs = np.zeros((5, 3))
    dirs[:, 2] = -1.0
    res = _trace(Assembly(subassemblies=[md]), pos, dirs,
                 100.0 * np.ones(5), reps=1776)

    hits = res.hits_of("receiver")
    # the central ray strikes the receiver's BACK on its way down (the
    # reference zeroes it unrecorded; here it is a flagged backside hit) —
    # the four front-side hits match the reference's accountant exactly
    front = ~hits["backside"].astype(bool)
    assert front.sum() == 4 and (~front).sum() == 1
    np.testing.assert_allclose(hits["local"][front, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.sort(hits["e_in"][front]),
                               [81.0, 81.0, 90.0, 90.0], rtol=1e-6)
