"""Heliostat tracking tests (cf. ref tests/models/test_tower.py)."""
import jax
import numpy as np

from tracer_tpu import TracerEngine
from tracer_tpu.bundle import RayBundle
from tracer_tpu.models.heliostat_field import (HeliostatField, radial_stagger,
                                               solar_vector)
from tracer_tpu.models.one_sided_mirror import one_sided_receiver
from tracer_tpu.scene import Assembly
from tracer_tpu import spatial as sp


def test_solar_vector():
    # sun due South (azimuth pi), 45 deg zenith -> vector with -y, +z
    v = solar_vector(np.pi, np.pi / 4)
    np.testing.assert_allclose(v, [0.0, -np.sin(np.pi / 4), np.cos(np.pi / 4)],
                               atol=1e-12)
    # overhead sun
    np.testing.assert_allclose(solar_vector(0.0, 0.0), [0, 0, 1], atol=1e-12)


def test_radial_stagger_layout():
    pos = radial_stagger(-np.pi / 4, np.pi / 4, np.pi / 16, 50.0, 100.0, 10.0)
    rads = np.hypot(pos[:, 0], pos[:, 1])
    assert (rads >= 50.0 - 1e-9).all() and (rads < 100.0).all()
    assert len(pos) > 10


def test_track_sun_normal_bisects():
    field = HeliostatField(positions=[[0.0, -100.0, 0.0]], width=6.0,
                           height=6.0, absorptivity=0.1, sigma=0.0)
    field.set_aim_height(40.0)
    normals = field.track_sun(azimuth=0.0, zenith=0.0)
    sun = np.array([0.0, 0.0, 1.0])
    aim = np.array([0.0, 100.0, 40.0])
    aim = aim / np.linalg.norm(aim)
    expected = sun + aim
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(normals[0], expected, atol=1e-12)


def test_heliostat_reflects_to_receiver():
    """End-to-end: overhead sun, one heliostat, tower receiver."""
    field = HeliostatField(positions=[[0.0, -100.0, 0.0]], width=6.0,
                           height=6.0, absorptivity=0.0, sigma=0.0)
    field.set_aim_height(40.0)
    field.track_sun(azimuth=0.0, zenith=0.0)

    # receiver: 10x10 plate at (0,0,40), facing the heliostat
    _, rec = one_sided_receiver(10.0, 10.0)
    aim_dir = np.array([0.0, -100.0, -40.0])
    aim_dir /= np.linalg.norm(aim_dir)
    rot = sp.rotation_to_z(aim_dir)
    rec.set_transform(sp.translate(0, 0, 40.0) @ sp._homog(rot))

    asm = Assembly(objects=[rec], subassemblies=[field])
    eng = TracerEngine(asm)

    # a few rays straight down onto the heliostat
    pos = np.array([[0.0, -100.0, 50.0], [1.0, -99.0, 50.0],
                    [-1.5, -101.0, 50.0]])
    dirs = np.tile([0.0, 0.0, -1.0], (3, 1))
    res = eng.ray_tracer(RayBundle.create(pos=pos, dir=dirs), reps=2,
                         key=jax.random.PRNGKey(0))
    hits = res.hits_of("receiver")
    # all three rays reach the receiver and deposit their full energy
    assert len(hits["absorbed"]) == 3
    np.testing.assert_allclose(hits["absorbed"].sum(), 3.0, rtol=1e-9)
    # central ray lands near the aim point (0,0,40)
    d = np.linalg.norm(hits["hit"] - np.array([0.0, 0.0, 40.0]), axis=1)
    assert d.min() < 0.2
