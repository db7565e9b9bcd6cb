"""Annual sun-path sweep (analysis/annual.py): solar geometry against
textbook identities, daylight-hour weighting, and an end-to-end
two-position efficiency sweep of a toy tower field.

The capability is beyond the reference (which fixes one sun position per
run, `Sandia_NSTTF_field example.py`:96-112); the solar geometry itself is
the standard Cooper/Duffie-Beckman formula set, pinned here to its
textbook identities."""
import jax
import jax.numpy as jnp
import numpy as np

from tracer_tpu import spatial as sp
from tracer_tpu.analysis.annual import (annual_sun_grid, efficiency_sweep,
                                        solar_angles, solar_declination)
from tracer_tpu.models.heliostat_field import HeliostatField, solar_vector
from tracer_tpu.models.one_sided_mirror import one_sided_receiver
from tracer_tpu.scene import Assembly


def test_solar_declination_identities():
    # Cooper's equation: zero at the March equinox (284 + 81 = 365),
    # +23.45 deg at the June solstice, -23.45 deg at the December one
    np.testing.assert_allclose(solar_declination(81.0), 0.0, atol=1e-12)
    np.testing.assert_allclose(solar_declination(172.25),
                               np.deg2rad(23.45), atol=1e-4)
    np.testing.assert_allclose(solar_declination(354.75),
                               -np.deg2rad(23.45), atol=1e-4)


def test_solar_angles_noon_and_morning():
    phi = np.deg2rad(35.0)
    # solar noon at the June solstice: sun due South, zenith = phi - delta
    az, zen = solar_angles(phi, 172.25, 12.0)
    np.testing.assert_allclose(az, np.pi, atol=1e-9)
    np.testing.assert_allclose(zen, phi - np.deg2rad(23.45), atol=1e-4)
    # mid-morning: sun in the southeast quadrant (azimuth 90-180 deg from
    # North, clockwise), higher zenith than noon
    az_m, zen_m = solar_angles(phi, 172.25, 9.0)
    assert np.pi / 2 < az_m < np.pi
    assert zen_m > zen
    # the angles must round-trip through solar_vector's convention:
    # elevation above horizon means positive z, morning means east (+x)
    v = solar_vector(float(az_m), float(zen_m))
    assert v[2] > 0 and v[0] > 0
    # afternoon mirror image of the same hour offset
    az_a, zen_a = solar_angles(phi, 172.25, 15.0)
    np.testing.assert_allclose(zen_a, zen_m, atol=1e-12)
    np.testing.assert_allclose(az_a, 2.0 * np.pi - az_m, atol=1e-9)


def test_annual_sun_grid_weights_cover_daylight():
    phi = np.deg2rad(35.0)
    grid = annual_sun_grid(phi, n_days=12, n_hours=8)
    assert grid.shape[1] == 3
    # every kept point is daylight above the elevation floor
    assert (grid[:, 1] < np.pi / 2 - np.deg2rad(3.0) + 1e-12).all()
    assert (grid[:, 2] > 0).all()
    # kept + excluded hours = the site's annual daylight hours (~half the
    # year at mid-latitudes)
    total = float(grid[:, 2].sum()) + grid.excluded
    assert 4200.0 < total < 4560.0
    # the elevation floor excludes only a small sliver of the day
    assert grid.excluded < 0.12 * total


def test_efficiency_sweep_two_positions():
    positions = np.array([[0.0, 60.0, 0.0], [10.0, 80.0, 0.0]])
    field = HeliostatField(positions, width=6.1, height=6.1,
                           absorptivity=0.05, sigma=0.0, bi_var=True)
    field.set_aim_height(30.0)
    _, rec = one_sided_receiver(11.0, 11.0)
    center = positions.mean(axis=0)
    aim_dir = np.array([center[0], center[1], -30.0 * 0.75])
    aim_dir /= np.linalg.norm(aim_dir)
    rec.set_transform(sp.translate(0, 0, 30.0)
                      @ sp._homog(sp.rotation_to_z(aim_dir)))
    asm = Assembly(objects=[rec], subassemblies=[field])

    angles = np.array([[np.pi, 0.3, 100.0],        # high sun from the south
                       [0.75 * np.pi, 0.6, 50.0]])  # lower, southeast
    res = efficiency_sweep(asm, field, angles,
                           total_mirror_area=2 * 6.1 * 6.1,
                           rays_per_position=20_000, slab=20_000,
                           max_path=4, dtype=jnp.float64,
                           key=jax.random.PRNGKey(3))
    eff, cos_eff = res["efficiency"], res["cosine_eff"]
    assert (res["receiver_kw"] > 0).all()
    assert ((0.0 < eff) & (eff < 1.0)).all()
    # optical efficiency is bounded by the cosine efficiency (every other
    # loss only subtracts) and should capture most of it here: a tight
    # two-mirror field aimed at a generous 11 m aperture
    assert (eff <= cos_eff + 1e-9).all()
    assert (eff > 0.5 * cos_eff).all()
    # the high-sun position outperforms the low one
    assert eff[0] > eff[1]
    # exact energy closure per position (float64 streaming path)
    np.testing.assert_allclose(res["closure"], 0.0, atol=1e-9)
    # annual aggregate = daylight-hour-weighted mean of the matrix
    w = angles[:, 2]
    np.testing.assert_allclose(res["annual_efficiency"],
                               (eff * w).sum() / w.sum(), rtol=1e-12)
    np.testing.assert_allclose(res["annual_receiver_mwh"],
                               (res["receiver_kw"] * w).sum() / 1e3,
                               rtol=1e-12)
