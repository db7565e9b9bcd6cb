"""Smoke + physics tests for the model library: PETAL, SG4, solar
simulator, 2N cavity (cf. ref tests/models/*)."""
import jax
import numpy as np
import pytest

from tracer_tpu import TracerEngine, spatial
from tracer_tpu.models.petal_dish import PETAL
from tracer_tpu.models.sg4 import SG4
from tracer_tpu.models.solar_simulator import (SolarSimulator, Target)
from tracer_tpu.models.two_n_cavity import TwoNParamCav
from tracer_tpu.sources import solar_disk_bundle


def test_petal_concentrates():
    petal = PETAL(diameter=5.0, focal_length=6.25, dish_opt_eff=0.9,
                  receiver_pos=6.95, receiver_side=0.4,
                  homogenizer_depth=0.7, homog_opt_eff=0.9)
    eng = TracerEngine(petal)
    sun = solar_disk_bundle(jax.random.PRNGKey(0), 20000,
                            center=[0, 0, 10.0], direction=[0, 0, -1.0],
                            radius=3.0, ang_range=0.005, flux=1000.0)
    res = eng.ray_tracer(sun, reps=20, key=jax.random.PRNGKey(1))
    absorbed = res.absorbed_by_logical()
    rec = absorbed[res.meta.index_of("receiver")]
    # hexagon area = 3*sqrt(3)/2 * R^2 ~ 16.24 m2 -> intercepted ~16.2 kW,
    # ~0.81 efficiency through two 0.9 stages
    assert rec > 10_000
    np.testing.assert_allclose(res.energy_balance()["closure"], 0.0,
                               atol=1e-6 * 28000)


def test_sg4_two_layers():
    sg4 = SG4(dishDiameter=25.0, dishFocus=13.4, absMirrors=0.1,
              sigma=2e-3)
    eng = TracerEngine(sg4)
    sun = solar_disk_bundle(jax.random.PRNGKey(2), 20000,
                            center=[0, 0, 30.0], direction=[0, 0, -1.0],
                            radius=13.0, ang_range=0.005, flux=1000.0)
    res = eng.ray_tracer(sun, reps=3, key=jax.random.PRNGKey(3))
    hits, absorbed = sg4.get_all_hits(res)
    assert absorbed.sum() > 0
    # inner dish sits 0.1 mm above the outer one and shadows it inside 10 m
    inner = res.absorbed_by_logical()[res.meta.index_of("dish_inner")]
    outer = res.absorbed_by_logical()[res.meta.index_of("dish_outer")]
    assert inner > 0 and outer > 0


def test_solar_simulator_fluxmap(tmp_path):
    bins = np.linspace(-0.1, 0.1, 11)
    target = Target(0.2, 0.2, location=[0, 0, 1.8], normal=[0, 0, -1.0],
                    binx=bins, biny=bins)
    sim = SolarSimulator(
        modules_positions=[[0.0, 0.0, 0.0]],
        modules_directions=[[0.0, 0.0, 1.0]],
        modules_dicts=[dict(a=0.4, b=0.4, c=0.5, zlim=(-0.49, -0.1),
                            lampdict={"model": "Zhu", "P_elec": 7e3})],
        targets=[target])
    sim.simulate(nrays=20000, ray_batch=10000, key=jax.random.PRNGKey(4),
                 save_dir=str(tmp_path))
    flux = np.asarray(target.fluxmap.mean)
    assert np.isfinite(flux).all() and flux.sum() > 0
    assert (tmp_path / "fluxmap_0.csv").exists()


def test_two_n_cavity_energy_balance():
    cav = TwoNParamCav(apertureRadius=0.3, frustaRadii=[0.5, 0.5],
                       frustaDepths=[0.4, 0.6], coneDepth=0.3,
                       eps_wall=0.87, el_FRUs=[1, 1], el_CON=1)
    cav.VF_sim(num_rays=10000, precision=0.02, key=jax.random.PRNGKey(5))
    # summation rule holds
    np.testing.assert_allclose(cav.VF.sum(axis=1), 1.0, atol=0.03)

    # solar trace into the cavity: the source plane sits just inside the
    # aperture (the aperture element is itself a surface of the scene)
    eng = TracerEngine(cav)
    sun = solar_disk_bundle(jax.random.PRNGKey(6), 20000,
                            center=[0, 0, 0.01], direction=[0, 0, 1.0],
                            radius=0.29, ang_range=0.05, flux=5e5)
    res = eng.ray_tracer(sun, reps=30, key=jax.random.PRNGKey(7))
    out = cav.energy_balance(res, T_init=900.0)
    solar_in = out["solar_in"]
    assert solar_in[1:].sum() > 0.8 * float(np.asarray(sun.energy).sum())
    # hot cavity at 900 K loses energy through the aperture
    assert out["Q"][0] < 0 and out["emissive_losses"] > 0
    # losses bounded by blackbody emission through the aperture area
    sigma = 5.6677e-8
    ap_area = np.pi * 0.3**2
    assert out["emissive_losses"] < sigma * 900**4 * ap_area * 1.5
